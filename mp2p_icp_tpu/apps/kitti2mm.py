"""kitti2mm — KITTI velodyne .bin to metric map.

Reference parity: apps/kitti2mm/main.cpp:46-77.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kitti2mm")
    ap.add_argument("-i", "--input", required=True, help="KITTI .bin file")
    ap.add_argument("-o", "--output", required=True, help=".mm.npz output")
    ap.add_argument("--layer", default="raw")
    ap.add_argument("--id", type=int, default=None)
    ap.add_argument("--label", default=None)
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.io.kitti import load_kitti_bin
    from mp2p_icp_tpu.io.mm import save_mm_file

    mm = MetricMap(id=args.id, label=args.label)
    mm.layers[args.layer] = load_kitti_bin(args.input)
    save_mm_file(args.output, mm)
    print(f"wrote {args.output}: {mm.contents_summary()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
