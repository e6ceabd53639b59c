"""mm-viewer — render a metric map to images / text report.

Reference parity: apps/mm-viewer/main.cpp (1154 LoC nanogui/OpenGL
inspector). Headless analogue: per-layer top-down + side-view matplotlib
renders with layer colouring, plus the contents summary.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm-viewer")
    ap.add_argument("input", help=".mm.npz metric map")
    ap.add_argument("-o", "--output-prefix", default=None,
                    help="write <prefix>_<layer>.png renders")
    ap.add_argument("-l", "--layer", action="append", default=None)
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.pointcloud import PointCloud
    from mp2p_icp_tpu.io.mm import load_mm_file

    mm = load_mm_file(args.input)
    print(mm.contents_summary())

    if args.output_prefix:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        layers = args.layer or list(mm.layers)
        for name in layers:
            layer = mm.layers.get(name)
            if not isinstance(layer, PointCloud):
                continue
            pts = layer.to_numpy()
            if len(pts) == 0:
                continue
            fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 6))
            c = pts[:, 2]
            ax1.scatter(pts[:, 0], pts[:, 1], s=1, c=c, cmap="viridis")
            ax1.set_title(f"{name} — top (colour = z)")
            ax1.set_aspect("equal")
            ax2.scatter(pts[:, 0], pts[:, 2], s=1, c=c, cmap="viridis")
            ax2.set_title(f"{name} — side")
            out = f"{args.output_prefix}_{name}.png"
            fig.savefig(out, dpi=110, bbox_inches="tight")
            plt.close(fig)
            print(f"wrote {out} ({len(pts)} points)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
