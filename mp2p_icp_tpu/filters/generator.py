"""Generators: sensor observations -> metric-map layers.

Reference parity: mp2p_icp_filters/include/mp2p_icp_filters/Generator.h:79-251
and src/Generator.cpp — regex gating on observation class name & sensor
label (Generator.cpp:381-393); the default path inserts points into a
point layer (Generator.cpp:447-487: MRPT's ``insertObservationInto``
projects 2D range scans / unprojects depth images into points); the custom
path builds arbitrary map layers from a YAML ``metric_map_definition``
(Generator.cpp:492-612); per-type hooks for rotating scans / velodyne / IMU
(Generator.cpp:162-275); ``apply_generators`` runs a list of generators
over an observation (Generator.cpp:276-305).

TPU-first observation model: without MRPT's CObservation class tree, an
``Observation`` is a plain record of numpy arrays + metadata. The class
name field mirrors the reference's MRPT class names so the same YAML regex
configs work. Decoding (polar -> Cartesian, organized range image ->
points) happens host-side in numpy at ingest — it is per-observation IO,
not per-iteration compute, so it stays off the device hot path.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap, VoxelGridLayer
from mp2p_icp_tpu.core.pointcloud import PointCloud, round_capacity


@dataclasses.dataclass
class Observation:
    """A sensor observation (reference analogue: mrpt::obs::CObservation*).

    class_name: e.g. 'CObservationPointCloud', 'CObservation2DRangeScan',
                'CObservationRotatingScan', 'CObservationVelodyneScan',
                'CObservationIMU', 'CObservationComment'.
    """

    class_name: str = "CObservationPointCloud"
    sensor_label: str = ""
    timestamp: float = 0.0
    xyz: Optional[np.ndarray] = None  # [N, 3]
    intensity: Optional[np.ndarray] = None
    ring: Optional[np.ndarray] = None
    time: Optional[np.ndarray] = None  # per-point relative times
    sensor_pose: Optional[se3.Pose] = None  # sensor on robot
    # --- 2D range scan (CObservation2DRangeScan fields) ---------------
    scan_ranges: Optional[np.ndarray] = None  # [N] ranges (m)
    scan_valid: Optional[np.ndarray] = None  # [N] bool (None = all valid)
    aperture: float = np.pi  # total angular aperture (rad)
    right_to_left: bool = True  # CCW scan direction
    max_range: float = 80.0
    # --- organized rotating scan (CObservationRotatingScan) ------------
    # range image [rows, cols] in metres (0 = no return); rows are rings
    range_image: Optional[np.ndarray] = None
    intensity_image: Optional[np.ndarray] = None
    azimuth_start: float = -np.pi  # azimuth of column 0
    azimuth_stop: float = np.pi  # azimuth past the last column
    elevation_angles: Optional[np.ndarray] = None  # [rows] rad
    sweep_duration: float = 0.0  # for per-point relative times
    # IMU: angular velocity / linear acceleration (CObservationIMU path)
    angular_velocity: Optional[Tuple[float, float, float]] = None
    linear_velocity: Optional[Tuple[float, float, float]] = None
    # comment observations can carry YAML metadata (reference: sm2mm reads
    # the local velocity buffer from a comment obs)
    text: Optional[str] = None


# ------------------------------------------------------------ decoders
def decode_scan2d(obs: Observation):
    """CObservation2DRangeScan -> [N, 3] sensor-frame points.

    Mirrors what MRPT's insertObservationInto does for 2D scans when the
    reference Generator falls through to the general case
    (Generator.cpp:477): ranges at evenly spaced bearings over ``aperture``
    centred on the sensor x-axis, z = 0.
    """
    r = np.asarray(obs.scan_ranges, np.float32).reshape(-1)
    n = r.shape[0]
    valid = (
        np.asarray(obs.scan_valid, bool).reshape(-1)
        if obs.scan_valid is not None
        else np.ones((n,), bool)
    )
    valid = valid & (r > 0) & (r < obs.max_range)
    if n > 1:
        a = (np.arange(n, dtype=np.float32) / (n - 1) - 0.5) * obs.aperture
    else:
        a = np.zeros((1,), np.float32)
    if not obs.right_to_left:
        a = -a
    pts = np.stack([r * np.cos(a), r * np.sin(a), np.zeros_like(r)], 1)
    return pts[valid].astype(np.float32), None, None, None


def decode_rotating_scan(obs: Observation):
    """CObservationRotatingScan -> sensor-frame points + I/R/T channels.

    Organized [rows, cols] range image: column -> azimuth (linear over
    [azimuth_start, azimuth_stop)), row -> elevation (from
    ``elevation_angles``); zero range = no return. Per-point ring = row id,
    per-point time = linear in azimuth over ``sweep_duration`` (the inputs
    FilterDeskew expects)."""
    R = np.asarray(obs.range_image, np.float32)
    rows, cols = R.shape
    az = obs.azimuth_start + (
        (obs.azimuth_stop - obs.azimuth_start)
        * (np.arange(cols, dtype=np.float32) + 0.5)
        / cols
    )
    if obs.elevation_angles is not None:
        el = np.asarray(obs.elevation_angles, np.float32).reshape(rows)
    else:
        el = np.zeros((rows,), np.float32)
    ca, sa = np.cos(az)[None, :], np.sin(az)[None, :]
    ce, se_ = np.cos(el)[:, None], np.sin(el)[:, None]
    x = R * ce * ca
    y = R * ce * sa
    z = R * se_
    valid = (R > 0) & np.isfinite(R)
    pts = np.stack([x[valid], y[valid], z[valid]], 1).astype(np.float32)
    ring = np.broadcast_to(
        np.arange(rows, dtype=np.float32)[:, None], R.shape
    )[valid]
    t = np.broadcast_to(
        (np.arange(cols, dtype=np.float32) + 0.5) / cols * obs.sweep_duration,
        R.shape,
    )[valid]
    inten = (
        np.asarray(obs.intensity_image, np.float32)[valid]
        if obs.intensity_image is not None
        else None
    )
    return pts, inten, ring.astype(np.float32), t.astype(np.float32)


# --------------------------------------------------------------- Generator
@dataclasses.dataclass(frozen=True)
class Generator:
    """Reference: Generator.h params (process_class_names_regex,
    process_sensor_labels_regex, target_layer, throw_on_unhandled,
    metric_map_definition...)."""

    target_layer: str = "raw"
    process_class_names_regex: str = ".*"
    process_sensor_labels_regex: str = ".*"
    throw_on_unhandled_observation_class: bool = False
    # merge new scans into the existing layer (sm2mm accumulation) or replace
    accumulate: bool = False
    # YAML metric_map_definition (Generator.cpp:492-612): when set, the
    # target layer is created from this class/params spec instead of a
    # plain point layer. Stored as a tuple-of-pairs so the dataclass stays
    # hashable; use generators_from_yaml to build from a dict.
    metric_map_definition: Tuple[Tuple[str, object], ...] = ()

    def handles(self, obs: Observation) -> bool:
        return bool(
            re.match(self.process_class_names_regex, obs.class_name)
            and re.match(self.process_sensor_labels_regex, obs.sensor_label)
        )

    # ------------------------------------------------------------- decode
    def _decode(self, obs: Observation):
        """Observation -> (xyz, intensity, ring, time) in sensor frame, or
        None when the observation type carries no point data."""
        cn = obs.class_name.split("::")[-1]
        if cn == "CObservation2DRangeScan" and obs.scan_ranges is not None:
            return decode_scan2d(obs)
        if cn == "CObservationRotatingScan" and obs.range_image is not None:
            return decode_rotating_scan(obs)
        if obs.xyz is not None:
            return (
                np.asarray(obs.xyz, np.float32).reshape(-1, 3),
                obs.intensity,
                obs.ring,
                obs.time,
            )
        return None

    def process(self, obs: Observation, mm: MetricMap) -> bool:
        """Insert the observation into mm. Returns True when handled
        (reference: Generator::process dispatch, Generator.cpp:371-487)."""
        cn = obs.class_name.split("::")[-1]
        # skipped types (Generator.cpp:381-387) — handled at pipeline level
        if cn in (
            "CObservationComment",
            "CObservationGPS",
            "CObservationRobotPose",
            "CObservationIMU",
        ):
            return False
        if not self.handles(obs):
            return False

        decoded = self._decode(obs)
        if decoded is None:
            if self.throw_on_unhandled_observation_class:
                raise ValueError(
                    f"Generator: observation {obs.class_name} could not be "
                    "converted into a point cloud (reference: "
                    "Generator.cpp:479-486 throw_on_unhandled semantics)"
                )
            return False
        xyz, intensity, ring, time = decoded
        if obs.sensor_pose is not None:
            import jax.numpy as jnp

            xyz = np.array(se3.apply(obs.sensor_pose, jnp.asarray(xyz)))

        if self.metric_map_definition:
            return self._insert_custom(
                xyz, mm, obs.sensor_pose,
                intensity=intensity, ring=ring, time=time,
            )

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

    # -------------------------------------------------------- custom maps
    def _insert_custom(
        self, xyz: np.ndarray, mm: MetricMap, sensor_pose=None,
        intensity=None, ring=None, time=None,
    ) -> bool:
        """Create-if-new + insert for a YAML-defined layer class
        (reference: implProcessCustomMap, Generator.cpp:492-612). Supported
        classes: point-map flavours (CSimplePointsMap/CPointsMapXYZI[RT])
        and CVoxelMap (occupancy voxel layer with optional free-space
        carving)."""
        import jax.numpy as jnp

        spec = dict(self.metric_map_definition)
        cls = str(spec.get("class", "CSimplePointsMap")).split("::")[-1]
        if cls in (
            "CSimplePointsMap",
            "CPointsMapXYZI",
            "CPointsMapXYZIRT",
        ):
            # the XYZI(RT) flavours carry per-point channels — dropping
            # them here would break later FilterByRing/Deskew/ByIntensity
            # on data the reference pipeline handles (Generator.cpp:522-557)
            pc = PointCloud.from_numpy(
                xyz,
                intensity=intensity if cls != "CSimplePointsMap" else None,
                ring=ring if cls == "CPointsMapXYZIRT" else None,
                time=time if cls == "CPointsMapXYZIRT" else None,
            )
            if self.target_layer in mm.layers:
                other = MetricMap()
                other.layers[self.target_layer] = pc
                mm.merge_with(other)
            else:
                mm.layers[self.target_layer] = pc
            return True
        if cls == "CVoxelMap":
            copts = dict(spec.get("creationOpts", ()) or ())
            iopts = dict(spec.get("insertOpts", ()) or ())
            res = float(copts.get("resolution", 0.5))
            cap = int(copts.get("capacity", 1 << 16))
            from mp2p_icp_tpu.ops.voxel_occupancy import update_voxel_map

            vg = mm.layers.get(self.target_layer)
            if not isinstance(vg, VoxelGridLayer):
                vg = VoxelGridLayer.empty(cap, res)
            pts = jnp.asarray(xyz)
            # rays originate at the SENSOR position (points were already
            # transformed into the vehicle frame by process()), so an
            # offset-mounted sensor carves free space from its true origin
            origin = (
                jnp.asarray(np.asarray(sensor_pose.t), jnp.float32)
                if sensor_pose is not None
                else jnp.zeros(3, jnp.float32)
            )
            vg = update_voxel_map(
                vg,
                pts,
                jnp.ones((pts.shape[0],), bool),
                origin,
                carve_free_space=bool(iopts.get("ray_trace", True)),
            )
            mm.layers[self.target_layer] = vg
            return True
        if self.throw_on_unhandled_observation_class:
            raise ValueError(f"metric_map_definition: unknown class {cls}")
        return False


def apply_generators(
    generators: Sequence[Generator], obs: Observation, mm: MetricMap
) -> bool:
    """Run generators in order (reference: apply_generators overloads,
    Generator.cpp:276-305)."""
    handled = False
    for g in generators:
        handled = g.process(obs, mm) or handled
    return handled


def generators_from_yaml(entries) -> list:
    """Reference: generators_from_yaml (Generator.cpp:328)."""

    def freeze(v):
        if isinstance(v, dict):
            return tuple((k, freeze(x)) for k, x in v.items())
        if isinstance(v, list):
            return tuple(freeze(x) for x in v)
        return v

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
                metric_map_definition=freeze(
                    p.get("metric_map_definition", {}) or {}
                ),
            )
        )
    return out or [Generator()]
