"""icp-run — standalone ICP registration CLI.

Reference parity: apps/icp-run/main.cpp:226-334 — load local/global clouds
(.mm / .xyz[.gz] / KITTI .bin), apply per-map filter pipelines from the
YAML config, run the ICP pipeline, print Results; optional initial guess
and profiling.

Usage:
  python -m mp2p_icp_tpu.apps.icp_run \
      --input-local local.xyz --input-global global.mm -c pipeline.yaml \
      [--guess "x y z yaw pitch roll"] [--profiler] [--out-log out.icplog.npz]
"""

from __future__ import annotations

import argparse
import sys
import time


def load_input_pc(path: str):
    """Load a metric map from any supported container (reference:
    apps/icp-run/main.cpp load_input_pc :117-223)."""
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.io.xyz import load_xyz_file

    if path.endswith(".mm") or path.endswith(".mm.npz"):
        from mp2p_icp_tpu.io.mm import load_mm_file

        return load_mm_file(path)
    if path.endswith(".bin"):
        from mp2p_icp_tpu.io.kitti import load_kitti_bin

        mm = MetricMap()
        mm.layers["raw"] = load_kitti_bin(path)
        return mm
    mm = MetricMap()
    mm.layers["raw"] = load_xyz_file(path)
    return mm


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="icp-run", description="ICP registration of two point clouds"
    )
    ap.add_argument("--input-local", required=True)
    ap.add_argument("--input-global", required=True)
    ap.add_argument("-c", "--config", required=True, help="YAML pipeline file")
    ap.add_argument(
        "--guess", default="0 0 0 0 0 0",
        help="initial guess: 'x y z yaw pitch roll' (radians)",
    )
    ap.add_argument("--profiler", action="store_true")
    ap.add_argument("--out-log", default=None,
                    help="save an .icplog.npz record of the run")
    ap.add_argument("--record-iterations", action="store_true",
                    help="store per-iteration poses in the log")
    ap.add_argument("--config-filters-local", default=None,
                    help="separate YAML file with a 'filters:' pipeline "
                         "for the LOCAL map (reference icp-run "
                         "--config-filters-local); overrides the main "
                         "config's filters for that side")
    ap.add_argument("--config-filters-global", default=None,
                    help="separate YAML file with a 'filters:' pipeline "
                         "for the GLOBAL map")
    ap.add_argument("--entry-name-filters-local", default=None,
                    help="section name in the main config holding the "
                         "LOCAL-map filter pipeline (reference "
                         "--entry-name-filters-local; default: "
                         "filters_local_map, then filters)")
    ap.add_argument("--entry-name-filters-global", default=None,
                    help="section name for the GLOBAL-map filter pipeline")
    ap.add_argument("-d", "--generate-debug-log", action="store_true",
                    help="enforce generation of the .icplog debug files "
                         "for icp-log-viewer, overriding the "
                         "generateDebugFiles value in the YAML (reference "
                         "icp-run/main.cpp argGenerateDebugFiles)")
    args = ap.parse_args(argv)

    import jax

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.icp import IterTermReason
    from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

    icp, params, sections = load_icp_config_file(args.config)
    if args.record_iterations or args.generate_debug_log:
        import dataclasses

        if args.record_iterations:
            params = dataclasses.replace(params, record_iterations=True)
        if args.generate_debug_log:
            params = dataclasses.replace(
                params, generate_debug_files=True,
                save_iteration_details=True,
            )

    local_mm = load_input_pc(args.input_local)
    global_mm = load_input_pc(args.input_global)

    def side_pipeline(cfg_file, entry_name, default_section):
        """Resolve one side's filter pipeline: a separate YAML file wins,
        then a named section of the main config, then the defaults
        (reference icp-run filter-resolution order, main.cpp:62-96)."""
        if cfg_file:
            import yaml as _y

            from mp2p_icp_tpu.pipeline.yaml_loader import (
                filter_pipeline_from_yaml,
            )

            with open(cfg_file) as f:
                cfg = _y.safe_load(f)
            entries = (
                cfg.get("filters", []) if isinstance(cfg, dict) else cfg
            )
            return filter_pipeline_from_yaml(entries)
        if entry_name:
            return sections.get(entry_name, [])
        for sec in (default_section, "filters"):
            if sec in sections:
                return sections[sec]
        return []

    for mm, pipe in (
        (local_mm, side_pipeline(args.config_filters_local,
                                 args.entry_name_filters_local,
                                 "filters_local_map")),
        (global_mm, side_pipeline(args.config_filters_global,
                                  args.entry_name_filters_global,
                                  "filters_global_map")),
    ):
        if pipe:
            apply_filter_pipeline(pipe, mm)

    g = [float(x) for x in args.guess.split()]
    guess = se3.from_xyz_ypr(*g)

    import numpy as np

    t0 = time.perf_counter()
    res = icp.align(local_mm, global_mm, guess, params)
    # host fetch = the only true sync on the axon TPU platform
    # (jax.block_until_ready does NOT block through the tunnel)
    t = np.asarray(res.optimal_tf.t)
    dt = time.perf_counter() - t0
    q = se3.rot_to_quat(res.optimal_tf.R)
    print(f"ICP result:")
    print(f"  translation : [{t[0]:.6f}, {t[1]:.6f}, {t[2]:.6f}]")
    print(f"  quat (wxyz) : {np.asarray(q).round(6).tolist()}")
    print(f"  iterations  : {int(res.n_iterations)}")
    print(
        f"  termination : "
        f"{IterTermReason(int(res.termination_reason)).name}"
    )
    print(f"  quality     : {float(res.quality):.4f}")
    print(f"  pairings    : {int(res.final_pairings.size())}")
    if args.profiler:
        print(f"  align time  : {dt * 1e3:.1f} ms (incl. compile on 1st run)")

    if args.out_log:
        from mp2p_icp_tpu.io.icplog import save_log

        save_log(args.out_log, local_mm, global_mm, guess, res)
        print(f"  log saved   : {args.out_log}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
