"""mm2txt — export metric-map layers to per-layer TXT files.

Reference parity: apps/mm2txt/main.cpp:118.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm2txt")
    ap.add_argument("input", help=".mm.npz metric map")
    ap.add_argument("-l", "--layer", action="append", default=None,
                    help="layer(s) to export (default: all)")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.pointcloud import PointCloud
    from mp2p_icp_tpu.io.mm import load_mm_file

    mm = load_mm_file(args.input)
    base = pathlib.Path(args.input).name.replace(".mm.npz", "").replace(
        ".npz", ""
    )
    layers = args.layer or list(mm.layers)
    for name in layers:
        layer = mm.layers.get(name)
        if not isinstance(layer, PointCloud):
            print(f"skipping non-point layer '{name}'")
            continue
        n = int(layer.count)
        cols = [layer.to_numpy()]
        for ch in ("intensity", "ring", "time"):
            v = getattr(layer, ch)
            if v is not None:
                cols.append(np.asarray(v[:n]).reshape(-1, 1))
        out = f"{base}_{name}.txt"
        np.savetxt(out, np.hstack(cols), fmt="%.6f")
        print(f"wrote {out} ({n} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
