"""Layered metric map container.

TPU-native replacement for the reference's ``mp2p_icp::metric_map_t``
(reference: mp2p_icp_map/include/mp2p_icp/metricmap.h:64-258 — a
``map<string, CMetricMap::Ptr>`` plus geometric lines/planes and optional
id/label/georeferencing metadata).

Here a map is a plain pytree: ``layers`` maps layer names to layer pytrees
(``PointCloud`` or ``VoxelGridLayer``); ``lines``/``planes`` are fixed-capacity
masked tensors; georeferencing is a small host-side metadata record. The
whole structure jit-traces and shards like any other pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core.pointcloud import PointCloud

# Conventional layer names (reference: Generator inserts into "raw";
# decimation filters emit "decimated" — Generator.h:120, demo YAMLs).
LAYER_RAW = "raw"
LAYER_DECIMATED = "decimated"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LineSet:
    """Fixed-capacity 3D line set: point + unit direction per line
    (reference: metric_map_t::lines, mrpt TLine3D)."""

    point: jax.Array  # [L, 3]
    direction: jax.Array  # [L, 3]
    count: jax.Array  # scalar i32

    def valid_mask(self):
        return jnp.arange(self.point.shape[0]) < self.count

    @staticmethod
    def empty(capacity: int = 8) -> "LineSet":
        return LineSet(
            point=jnp.zeros((capacity, 3), jnp.float32),
            direction=jnp.zeros((capacity, 3), jnp.float32),
            count=jnp.asarray(0, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlaneSet:
    """Fixed-capacity plane patches: unit normal + centroid
    (reference: plane_patch_t, mp2p_icp_map/include/mp2p_icp/plane_patch.h:30-39)."""

    normal: jax.Array  # [P, 3]
    centroid: jax.Array  # [P, 3]
    count: jax.Array  # scalar i32

    def valid_mask(self):
        return jnp.arange(self.normal.shape[0]) < self.count

    @staticmethod
    def empty(capacity: int = 8) -> "PlaneSet":
        return PlaneSet(
            normal=jnp.zeros((capacity, 3), jnp.float32),
            centroid=jnp.zeros((capacity, 3), jnp.float32),
            count=jnp.asarray(0, jnp.int32),
        )


@dataclasses.dataclass
class Georeferencing:
    """WGS-84 anchor + ENU->map transform (reference: metricmap.h:134-150).
    Host-side metadata only — never traced."""

    latitude: float = 0.0
    longitude: float = 0.0
    height: float = 0.0
    t_enu_to_map_xyz: tuple = (0.0, 0.0, 0.0)
    t_enu_to_map_quat_wxyz: tuple = (1.0, 0.0, 0.0, 0.0)
    # 6x6 SE(3) covariance of T_enu_to_map (reference: CPose3DPDFGaussian
    # cov, metricmap.cpp:842) as a nested 6-tuple of 6-tuples; None = exact
    t_enu_to_map_cov: Optional[tuple] = None


Layer = Union[PointCloud, "VoxelGridLayer"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelGridLayer:
    """Sparse voxel occupancy layer (reference analogue: Bonxai CVoxelMap).

    Fixed-capacity open-addressed record of occupied voxels:
      keys:      [C, 3] int32 integer voxel coordinates
      occupancy: [C]    float32 in [0, 1] (0.5 = unknown prior)
      valid:     [C]    bool
    """

    keys: jax.Array
    occupancy: jax.Array
    valid: jax.Array
    # static (aux) field: metres per voxel
    resolution: float = dataclasses.field(
        default=0.1, metadata=dict(static=True)
    )

    @staticmethod
    def empty(capacity: int, resolution: float) -> "VoxelGridLayer":
        return VoxelGridLayer(
            keys=jnp.zeros((capacity, 3), jnp.int32),
            occupancy=jnp.full((capacity,), 0.5, jnp.float32),
            valid=jnp.zeros((capacity,), bool),
            resolution=resolution,
        )

    def centers(self) -> jax.Array:
        return (self.keys.astype(jnp.float32) + 0.5) * self.resolution


@dataclasses.dataclass
class MetricMap:
    """The layered map. Mutable host-side container of device-resident layers
    (the per-layer pytrees are immutable; pipeline stages replace them).

    Reference parity (metricmap.h:64-258): layers dict, lines, planes,
    id/label metadata, georeferencing, empty(), contents_summary(),
    merge_with(), save/load (io.mm module).
    """

    layers: Dict[str, Layer] = dataclasses.field(default_factory=dict)
    lines: LineSet = dataclasses.field(default_factory=LineSet.empty)
    planes: PlaneSet = dataclasses.field(default_factory=PlaneSet.empty)
    id: Optional[int] = None
    label: Optional[str] = None
    georeferencing: Optional[Georeferencing] = None

    def empty(self) -> bool:
        if self.layers:
            return False
        return int(self.lines.count) == 0 and int(self.planes.count) == 0

    def point_layer(self, name: str) -> PointCloud:
        layer = self.layers[name]
        if not isinstance(layer, PointCloud):
            raise TypeError(f"layer '{name}' is not a point layer")
        return layer

    def size(self) -> int:
        n = 0
        for layer in self.layers.values():
            if isinstance(layer, PointCloud):
                n += int(layer.count)
            else:
                n += int(jnp.sum(layer.valid))
        return n

    def contents_summary(self) -> str:
        """Human-readable summary (reference: metricmap.cpp contents_summary)."""
        if not self.layers and self.empty():
            return "empty"
        parts = []
        if self.id is not None:
            parts.append(f"id={self.id}")
        if self.label is not None:
            parts.append(f"label='{self.label}'")
        for name, layer in self.layers.items():
            if isinstance(layer, PointCloud):
                parts.append(f"layer '{name}': {int(layer.count)} points "
                             f"(capacity {layer.capacity})")
            else:
                parts.append(
                    f"layer '{name}': voxelgrid res={layer.resolution} "
                    f"({int(jnp.sum(layer.valid))} occupied)"
                )
        if int(self.lines.count):
            parts.append(f"{int(self.lines.count)} lines")
        if int(self.planes.count):
            parts.append(f"{int(self.planes.count)} planes")
        if self.georeferencing is not None:
            parts.append("georeferenced")
        return "; ".join(parts)

    def copy(self) -> "MetricMap":
        return MetricMap(
            layers=dict(self.layers),
            lines=self.lines,
            planes=self.planes,
            id=self.id,
            label=self.label,
            georeferencing=self.georeferencing,
        )

    def merge_with(self, other: "MetricMap", pose=None) -> None:
        """Merge other's layers into self, optionally transforming by pose
        (reference: metricmap.cpp:442-532 merge_with)."""
        from mp2p_icp_tpu.core.pointcloud import round_capacity

        for name, layer in other.layers.items():
            if not isinstance(layer, PointCloud):
                if pose is not None:
                    raise NotImplementedError(
                        f"merge_with: transforming non-point layer '{name}' "
                        "by a pose is not supported — inserting it "
                        "untransformed would silently misplace the data"
                    )
                if name not in self.layers:
                    self.layers[name] = layer
                continue
            src = layer.transformed(pose) if pose is not None else layer
            if name not in self.layers:
                self.layers[name] = src
                continue
            dst = self.point_layer(name)
            n_dst, n_src = int(dst.count), int(src.count)
            cap = round_capacity(n_dst + n_src)
            merged = np.full((cap, 3), PointCloud.PAD_VALUE, np.float32)
            merged[:n_dst] = np.asarray(dst.xyz[:n_dst])
            merged[n_dst : n_dst + n_src] = np.asarray(src.xyz[:n_src])

            # per-point channels survive the merge (reference merge_with
            # copies full point records, metricmap.cpp:442-532): a channel
            # present on EITHER side is kept, zero-filled where absent
            def merge_ch(a, b):
                if a is None and b is None:
                    return None
                m = np.zeros((cap,), np.float32)
                if a is not None:
                    m[:n_dst] = np.asarray(a[:n_dst])
                if b is not None:
                    m[n_dst : n_dst + n_src] = np.asarray(b[:n_src])
                return jnp.asarray(m)

            self.layers[name] = PointCloud(
                xyz=jnp.asarray(merged),
                count=jnp.asarray(n_dst + n_src, jnp.int32),
                intensity=merge_ch(dst.intensity, src.intensity),
                ring=merge_ch(dst.ring, src.ring),
                time=merge_ch(dst.time, src.time),
            )
