"""mm-info — print a metric map's contents summary.

Reference parity: apps/mm-info/main.cpp:36-48.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm-info")
    ap.add_argument("input", help=".mm.npz metric map file")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.io.mm import load_mm_file

    mm = load_mm_file(args.input)
    print(mm.contents_summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
