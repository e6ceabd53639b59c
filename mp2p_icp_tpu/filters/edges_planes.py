"""LOAM-style edge/plane feature extraction by per-voxel eigen analysis.

Reference parity: mp2p_icp_filters/src/FilterEdgesPlanes.cpp:59-221 —
voxelise the cloud; for each voxel with >= 5 points compute the covariance
eigenvalues (e0 <= e1 <= e2) and classify:
  EDGE  when e2 < max_e2_e0 * e0  and e1 < max_e1_e0 * e0
  PLANE when e2 > min_e2_e0 * e0  and e1 > min_e1_e0 * e0 and e1 > min_e1
Plane voxels contribute a plane (centroid + smallest-eigenvector normal,
flipped to face the vehicle) to the map's plane set and their centroid to
the ``plane_centroids`` layer; near-horizontal planes (|n_z| >= 0.9) are
kept as planes but their member points are dropped from ``plane_points``
(uneven ground density breaks ICP, reference comment :186-190). Member
points are voxel-decimated into ``edge_points`` / ``plane_points``; every
``full_pointcloud_decimation``-th point of every voxel goes to
``full_decim``.

TPU-first: one voxel sort + batched segment mean/cov + closed-form batched
eigendecomposition; per-point classification masks; compaction per output
layer. The extracted planes ride in the reserved ``_planes`` key (a
PlaneSet pytree) which apply_filter_pipeline moves into MetricMap.planes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import PlaneSet
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact
from mp2p_icp_tpu.ops.eigen import eigh3x3
from mp2p_icp_tpu.ops.voxel_unique import voxel_segments


@dataclasses.dataclass(frozen=True)
class FilterEdgesPlanes(FilterBase):
    """Params (reference: FilterEdgesPlanes.h:60-71, defaults preserved)."""

    input_pointcloud_layer: str = "raw"
    voxel_filter_resolution: float = 0.5
    full_pointcloud_decimation: int = 20
    voxel_filter_decimation: int = 1
    voxel_filter_max_e2_e0: float = 30.0
    voxel_filter_max_e1_e0: float = 30.0
    voxel_filter_min_e2_e0: float = 100.0
    voxel_filter_min_e1_e0: float = 100.0
    voxel_filter_min_e1: float = 0.0
    min_points_per_voxel: int = 5

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        C = pc.capacity
        valid = pc.valid_mask()
        segs = voxel_segments(pc.xyz, valid, self.voxel_filter_resolution)
        seg = segs.segment_id
        xyz_sorted = pc.xyz[segs.order]
        w = segs.valid.astype(jnp.float32)

        # per-voxel mean & covariance (segment reductions)
        cnt = jax.ops.segment_sum(w, seg, num_segments=C)
        n_safe = jnp.maximum(cnt, 1.0)
        mean = (
            jax.ops.segment_sum(xyz_sorted * w[:, None], seg, num_segments=C)
            / n_safe[:, None]
        )
        centered = (xyz_sorted - mean[seg]) * w[:, None]
        cov = (
            jax.ops.segment_sum(
                jnp.einsum("ci,cj->cij", centered, centered), seg,
                num_segments=C,
            )
            / n_safe[:, None, None]
        )
        evals, evecs = eigh3x3(cov)  # ascending, [C, 3] / [C, 3, 3]
        e0, e1, e2 = evals[:, 0], evals[:, 1], evals[:, 2]
        enough = cnt >= self.min_points_per_voxel

        is_edge = enough & (e2 < self.voxel_filter_max_e2_e0 * e0) & (
            e1 < self.voxel_filter_max_e1_e0 * e0
        )
        is_plane = (
            enough
            & ~is_edge
            & (e2 > self.voxel_filter_min_e2_e0 * e0)
            & (e1 > self.voxel_filter_min_e1_e0 * e0)
            & (e1 > self.voxel_filter_min_e1)
        )

        # plane normal = smallest eigenvector, flipped to face the vehicle
        n = evecs[:, :, 0]
        c_norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
        u = mean / jnp.maximum(c_norm, 1e-9)
        flip = jnp.sum(u * n, axis=-1, keepdims=True) > 0
        n = jnp.where(flip, -n, n)
        horizontal = jnp.abs(n[:, 2]) >= 0.9

        # per-point masks: voxel class + in-voxel decimation
        seg_start = jax.ops.segment_min(
            jnp.arange(C, dtype=jnp.int32), seg, num_segments=C
        )
        pos = jnp.arange(C, dtype=jnp.int32) - seg_start[seg]
        decim_ok = (pos % max(self.voxel_filter_decimation, 1)) == 0

        pt_edge = segs.valid & is_edge[seg] & decim_ok
        pt_plane = segs.valid & is_plane[seg] & ~horizontal[seg] & decim_ok

        # map the sorted-row masks back to original point order
        def unsort(mask_sorted):
            return jnp.zeros((C,), bool).at[segs.order].set(mask_sorted)

        out = dict(layers)
        out["edge_points"] = compact(pc, unsort(pt_edge))
        out["plane_points"] = compact(pc, unsort(pt_plane))

        if self.full_pointcloud_decimation > 0:
            full_ok = segs.valid & (
                (pos % self.full_pointcloud_decimation) == 0
            )
            out["full_decim"] = compact(pc, unsort(full_ok))

        # plane centroids layer + PlaneSet (first rows = plane voxels)
        plane_rank = jnp.cumsum(is_plane.astype(jnp.int32)) - 1
        n_planes = jnp.sum(is_plane.astype(jnp.int32))
        dest = jnp.where(is_plane, plane_rank, C)
        cent_buf = (
            jnp.full((C + 1, 3), PointCloud.PAD_VALUE, jnp.float32)
            .at[dest]
            .set(mean)[:C]
        )
        norm_buf = (
            jnp.zeros((C + 1, 3), jnp.float32).at[dest].set(n)[:C]
        )
        out["plane_centroids"] = PointCloud(xyz=cent_buf, count=n_planes)
        out["_planes"] = PlaneSet(
            normal=norm_buf, centroid=cent_buf, count=n_planes
        )
        return out
