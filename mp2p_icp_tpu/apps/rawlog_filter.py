"""rawlog-filter — apply generators + filter pipelines to an observation
stream, writing a processed stream.

Reference parity: apps/rawlog-filter/main.cpp:36-245 — for each observation
in [--from, --to]: run generators into a fresh metric map; skip unhandled
observations; apply the filter pipeline; emit one sensory frame holding the
ORIGINAL observation plus one point-cloud observation per output point
layer, labelled ``out_<layer>``. Twist/robot dynamic variables default to
zero (main.cpp:141-152).

Container: `.rawlog.npz` (io/rawlog.py) instead of MRPT's gz archive.
"""

from __future__ import annotations

import argparse
import sys
import time

import yaml


def main(argv=None):
    ap = argparse.ArgumentParser(prog="rawlog-filter")
    ap.add_argument("-i", "--input", required=True, help=".rawlog.npz input")
    ap.add_argument("-o", "--output", required=True, help=".rawlog.npz output")
    ap.add_argument(
        "-p", "--pipeline", required=True,
        help="YAML with generators:/filters: sections",
    )
    ap.add_argument("--from", dest="from_index", type=int, default=0,
                    help="first observation index to process")
    ap.add_argument("--to", dest="to_index", type=int, default=None,
                    help="last observation index to process")
    ap.add_argument("-v", "--verbosity", default="INFO")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.core.pointcloud import PointCloud
    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.filters.generator import (
        apply_generators,
        generators_from_yaml,
    )
    from mp2p_icp_tpu.io.rawlog import Rawlog, pointcloud_to_observation
    from mp2p_icp_tpu.pipeline.yaml_loader import filter_pipeline_from_yaml

    with open(args.pipeline) as f:
        cfg = yaml.safe_load(f) or {}
    if "generators" not in cfg:
        print("[rawlog-filter] Warning: no generators defined in the "
              "pipeline, using default generator.")
    generators = generators_from_yaml(cfg.get("generators"))
    if "filters" not in cfg:
        print("[rawlog-filter] Warning: no filters defined in the pipeline.")

    # zero-default twist / robot-pose dynamic variables, declared BEFORE
    # the pipeline parse so $f{} params may reference them
    # (reference: main.cpp:141-152 declares them first)
    variables = {v: 0.0 for v in ("vx", "vy", "vz", "wx", "wy", "wz",
                                  "robot_x", "robot_y", "robot_z",
                                  "robot_yaw", "robot_pitch", "robot_roll")}
    filters = filter_pipeline_from_yaml(cfg.get("filters"), variables)

    print(f"[rawlog-filter] Reading input rawlog from: '{args.input}'...")
    rl = Rawlog.load(args.input)
    print(f"[rawlog-filter] Done read dataset ({len(rl)} entries)")

    n = len(rl)
    last = min(n - 1, args.to_index) if args.to_index is not None else n - 1
    out = Rawlog()
    t0 = time.time()
    frame_id = 0
    for i in range(max(0, args.from_index), last + 1):
        obs = rl.observations[i]
        mm = MetricMap()
        handled = apply_generators(generators, obs, mm)
        if not handled:
            continue
        apply_filter_pipeline(filters, mm, variables)
        out.append(obs, frame=frame_id)
        for name in sorted(mm.layers):
            layer = mm.layers[name]
            if not isinstance(layer, PointCloud):
                continue
            out.append(
                pointcloud_to_observation(
                    layer,
                    sensor_label=f"out_{name}",
                    timestamp=obs.timestamp,
                ),
                frame=frame_id,
            )
        frame_id += 1
        if args.verbosity != "QUIET":
            pc = (i + 1 - args.from_index) / max(1, last + 1 - args.from_index)
            eta = (time.time() - t0) * (1 / pc - 1) if pc > 0 else 0.0
            print(f"\r{i + 1}/{last + 1} ({100 * pc:.1f}%) ETA={eta:.0f}s",
                  end="", flush=True)
    print()

    out.save(args.output)
    print(f"[rawlog-filter] Wrote '{args.output}' ({len(out)} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
