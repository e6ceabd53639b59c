"""mm-filter — apply a filter pipeline to a metric map.

Reference parity: apps/mm-filter/main.cpp:165 (incl. --rename-layer mode).
"""

from __future__ import annotations

import argparse
import sys

import yaml


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mm-filter")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-p", "--pipeline", default=None, help="YAML filter file")
    ap.add_argument("--rename-layer", default=None, help="OLD=NEW")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.io.mm import load_mm_file, save_mm_file
    from mp2p_icp_tpu.pipeline.yaml_loader import filter_pipeline_from_yaml

    mm = load_mm_file(args.input)
    if args.rename_layer:
        old, new = args.rename_layer.split("=")
        if old not in mm.layers:
            raise SystemExit(f"error: no layer '{old}'")
        mm.layers[new] = mm.layers.pop(old)
    if args.pipeline:
        with open(args.pipeline) as f:
            cfg = yaml.safe_load(f)
        filters = filter_pipeline_from_yaml(
            cfg.get("filters", cfg) if isinstance(cfg, dict) else cfg
        )
        apply_filter_pipeline(filters, mm)
    save_mm_file(args.output, mm)
    print(f"wrote {args.output}: {mm.contents_summary()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
