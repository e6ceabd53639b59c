"""sm-filter — apply generators + filters to every keyframe of a simple map,
writing a processed simple map.

Reference parity: apps/rawlog-filter (process an observation stream through
generators+filters and write the processed stream). The MRPT rawlog
container is replaced by the `.sm.npz` keyframe map; each observation is
regenerated from a chosen output layer.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import yaml


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sm-filter")
    ap.add_argument("-i", "--input", required=True, help=".sm.npz input")
    ap.add_argument("-o", "--output", required=True, help=".sm.npz output")
    ap.add_argument("-p", "--pipeline", required=True,
                    help="YAML with generators/filters sections")
    ap.add_argument("--output-layer", default="raw",
                    help="layer written back as the processed observation")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.filters.generator import (
        Observation,
        apply_generators,
        generators_from_yaml,
    )
    from mp2p_icp_tpu.filters.sm2mm import SimpleMap
    from mp2p_icp_tpu.pipeline.yaml_loader import filter_pipeline_from_yaml

    with open(args.pipeline) as f:
        cfg = yaml.safe_load(f)
    generators = generators_from_yaml(cfg.get("generators"))
    filters = filter_pipeline_from_yaml(cfg.get("filters"))

    sm = SimpleMap.load(args.input)
    n_pts_in = n_pts_out = 0
    for kf in sm.keyframes:
        new_obs = []
        for obs in kf.observations:
            if obs.xyz is None:
                new_obs.append(obs)
                continue
            n_pts_in += obs.xyz.shape[0]
            mm = MetricMap()
            apply_generators(generators, obs, mm)
            apply_filter_pipeline(filters, mm)
            layer = mm.layers.get(args.output_layer)
            if layer is None:
                new_obs.append(obs)
                continue
            n = int(layer.count)
            n_pts_out += n
            new_obs.append(
                Observation(
                    class_name=obs.class_name,
                    sensor_label=obs.sensor_label,
                    timestamp=obs.timestamp,
                    xyz=layer.to_numpy(),
                    intensity=(
                        np.asarray(layer.intensity[:n])
                        if layer.intensity is not None else None
                    ),
                    ring=(
                        np.asarray(layer.ring[:n])
                        if layer.ring is not None else None
                    ),
                    time=(
                        np.asarray(layer.time[:n])
                        if layer.time is not None else None
                    ),
                )
            )
        kf.observations = new_obs
    sm.save(args.output)
    print(
        f"wrote {args.output}: {len(sm.keyframes)} keyframes, "
        f"{n_pts_in} -> {n_pts_out} points"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
