"""Generators: sensor observations -> metric-map layers.

Reference parity: mp2p_icp_filters/include/mp2p_icp_filters/Generator.h:79-251
and src/Generator.cpp — regex gating on observation class name & sensor
label; the default path inserts points into a "raw" layer; per-type hooks
for 2D scans / 3D point clouds / velodyne / IMU; ``apply_generators`` runs a
list of generators over an observation.

TPU-first observation model: without MRPT's CObservation class tree, an
``Observation`` is a plain record of numpy/jax arrays + metadata. The class
name field mirrors the reference's MRPT class names so the same YAML regex
configs work.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pointcloud import PointCloud, round_capacity


@dataclasses.dataclass
class Observation:
    """A sensor observation (reference analogue: mrpt::obs::CObservation*).

    class_name: e.g. 'CObservationPointCloud', 'CObservation2DRangeScan',
                'CObservationVelodyneScan', 'CObservationIMU',
                'CObservationComment'.
    """

    class_name: str = "CObservationPointCloud"
    sensor_label: str = ""
    timestamp: float = 0.0
    xyz: Optional[np.ndarray] = None  # [N, 3]
    intensity: Optional[np.ndarray] = None
    ring: Optional[np.ndarray] = None
    time: Optional[np.ndarray] = None  # per-point relative times
    sensor_pose: Optional[se3.Pose] = None  # sensor on robot
    # IMU: angular velocity / linear acceleration (CObservationIMU path)
    angular_velocity: Optional[Tuple[float, float, float]] = None
    # comment observations can carry YAML metadata (reference: sm2mm reads
    # the local velocity buffer from a comment obs)
    text: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class Generator:
    """Reference: Generator.h params (process_class_names_regex,
    process_sensor_labels_regex, target_layer, throw_on_unhandled...)."""

    target_layer: str = "raw"
    process_class_names_regex: str = ".*"
    process_sensor_labels_regex: str = ".*"
    throw_on_unhandled_observation_class: bool = False
    # merge new scans into the existing layer (sm2mm accumulation) or replace
    accumulate: bool = False

    def handles(self, obs: Observation) -> bool:
        return bool(
            re.match(self.process_class_names_regex, obs.class_name)
            and re.match(self.process_sensor_labels_regex, obs.sensor_label)
        )

    def process(self, obs: Observation, mm: MetricMap) -> bool:
        """Insert the observation into mm. Returns True when handled
        (reference: Generator::process dispatch, Generator.cpp:371-430)."""
        if not self.handles(obs):
            return False
        if obs.class_name in ("CObservationIMU", "CObservationComment"):
            return False  # handled at the pipeline level (velocity buffer)
        if obs.xyz is None:
            if self.throw_on_unhandled_observation_class:
                raise ValueError(
                    f"Generator: observation {obs.class_name} carries no points"
                )
            return False

        xyz = np.asarray(obs.xyz, np.float32).reshape(-1, 3)
        intensity, ring, time = obs.intensity, obs.ring, obs.time
        if obs.sensor_pose is not None:
            import jax.numpy as jnp

            xyz = np.array(se3.apply(obs.sensor_pose, jnp.asarray(xyz)))

        pc = PointCloud.from_numpy(
            xyz, intensity=intensity, ring=ring, time=time
        )
        if self.accumulate and self.target_layer in mm.layers:
            other = MetricMap()
            other.layers[self.target_layer] = pc
            mm.merge_with(other)
        else:
            mm.layers[self.target_layer] = pc
        return True


def apply_generators(
    generators: Sequence[Generator], obs: Observation, mm: MetricMap
) -> bool:
    """Run generators in order (reference: apply_generators overloads)."""
    handled = False
    for g in generators:
        handled = g.process(obs, mm) or handled
    return handled


def generators_from_yaml(entries) -> list:
    """Reference: generators_from_yaml (Generator.cpp:328)."""
    out = []
    for entry in entries or []:
        cls = str(entry.get("class_name", "Generator")).split("::")[-1]
        if cls != "Generator":
            raise ValueError(f"Unknown generator class: {cls}")
        p = entry.get("params", {}) or {}
        out.append(
            Generator(
                target_layer=p.get("target_layer", "raw"),
                process_class_names_regex=p.get(
                    "process_class_names_regex", ".*"
                ),
                process_sensor_labels_regex=p.get(
                    "process_sensor_labels_regex", ".*"
                ),
                throw_on_unhandled_observation_class=bool(
                    p.get("throw_on_unhandled_observation_class", False)
                ),
            )
        )
    return out or [Generator()]
