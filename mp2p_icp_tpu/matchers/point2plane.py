"""Point-to-plane matcher: fit a plane to the kNN neighbourhood of each
local point and emit pt2pl pairings when the neighbourhood is plane-like.

Reference parity: mp2p_icp/src/Matcher_Point2Plane.cpp:41-114. The reference
delegates to plane-capable map classes (``NearestPlaneCapable`` — NDT /
voxel-with-normals maps in mola_metric_maps, out of repo); for plain point
layers it offers Matcher_Adaptive's plane path. Here point layers are the
native representation, so this matcher fits planes from the kNN
neighbourhood directly (same criterion as the reference's adaptive plane
detection: lambda0 < planeEigenThreshold * lambda2).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pairings import PairsPt2Pl
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.matchers.base import (
    GridCache,
    point_layers,
    LayerMatch,
    MatchContext,
    Matcher,
    MatchState,
    transformed_local,
)
from mp2p_icp_tpu.ops.eigen import estimate_points_eigen
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce


@dataclasses.dataclass(frozen=True)
class MatcherPoint2Plane(Matcher):
    """Params (reference: Matcher_Point2Plane.h:60-73)."""

    distance_threshold: float = 0.40
    knn: int = 7
    plane_eigen_threshold: float = 1e-2
    min_points_to_fit: int = 4
    allow_match_already_matched_points: bool = False
    layer_matches: Tuple[LayerMatch, ...] = (LayerMatch(),)
    k_per_cell: int = 16
    # Use the global layer's PRECOMPUTED per-point normals (PointCloud.
    # normals, ops/normals.py) instead of re-fitting a plane from the kNN
    # neighbourhood every iteration: per-iteration work drops to a k=1 NN
    # + gather. This mirrors the reference's actual Matcher_Point2Plane
    # contract — it queries a plane-capable MAP for the nearest plane
    # (NearestPlaneCapable, Matcher_Point2Plane.cpp:41-114) whose plane
    # fits were precomputed at insertion; the knn re-fit above is the
    # fallback for maps without normals.
    use_point_normals: bool = False
    # TPU-specific: mesh axis name when the global map is spatially
    # sharded (set by parallel.spatial / SpatialOdometryMapper; SURVEY
    # §5.7). Each device kNN-sweeps its shard and the merged k-lists
    # carry neighbour COORDS (NNResult.xyz), which the plane fit consumes
    # directly — no cross-shard gather is ever needed.
    spatial_axis: object = None
    spatial_num_shards: int = 1

    def search_radius(self) -> float:
        return self.distance_threshold

    def out_capacity(self, local_map: MetricMap) -> int:
        return sum(
            point_layers(local_map)[lm.local_layer].capacity
            for lm in self.layer_matches
        )

    def match(
        self,
        grids: GridCache,
        global_map: MetricMap,
        local_map: MetricMap,
        pose: Pose,
        state: MatchState,
        ctx: MatchContext,
    ):
        gate = self.gate(ctx.icp_iteration)
        blocks = []
        potential = jnp.asarray(0, jnp.int32)
        new_local = dict(state.local_paired) if state is not None else None

        for lm in self.layer_matches:
            local = point_layers(local_map)[lm.local_layer]
            glayer = point_layers(global_map)[lm.global_layer]
            pts, valid = transformed_local(local, pose)
            potential = potential + local.count * gate.astype(jnp.int32)
            if state is not None and not self.allow_match_already_matched_points:
                valid = valid & ~state.local_paired[lm.local_layer]

            if self.use_point_normals:
                if glayer.normals is None:
                    raise ValueError(
                        "use_point_normals=True but global layer "
                        f"'{lm.global_layer}' has no normals channel — "
                        "run FilterEstimateNormals / ops.normals first"
                    )
                # nearest-plane query on a plane-capable map: k=1 NN,
                # plane = (neighbour point, its stored normal). Under
                # spatial sharding the normals ride the all_gather k-merge
                # as the kNN payload (cross-shard gathers are impossible).
                res = knn_bruteforce(
                    pts, valid, glayer.xyz, glayer.valid_mask(), k=1,
                    max_radius_sq=self.distance_threshold**2,
                    spatial_axis=self.spatial_axis,
                    point_payload=(
                        glayer.normals
                        if self.spatial_axis is not None else None
                    ),
                )
                if self.spatial_axis is not None:
                    centroid = res.xyz[:, 0]
                    normal = res.payload[:, 0]
                else:
                    g_idx = jnp.clip(
                        res.idx[:, 0], 0, glayer.capacity - 1
                    )
                    centroid = glayer.xyz[g_idx]
                    normal = glayer.normals[g_idx]
                has_plane = jnp.sum(normal * normal, axis=-1) > 0.5
                keep = valid & res.valid[:, 0] & has_plane
                w = jnp.where(keep, lm.weight * gate, 0.0)
                blocks.append(
                    PairsPt2Pl(
                        local=local.xyz,
                        plane_centroid=centroid,
                        plane_normal=normal,
                        weight=w,
                        local_idx=jnp.where(
                            w > 0,
                            jnp.arange(local.capacity, dtype=jnp.int32),
                            -1,
                        ),
                    )
                )
                if state is not None:
                    new_local[lm.local_layer] = (
                        state.local_paired[lm.local_layer] | (w > 0)
                    )
                continue

            res = knn_bruteforce(
                pts, valid, glayer.xyz, glayer.valid_mask(), k=self.knn,
                max_radius_sq=self.distance_threshold**2,
                spatial_axis=self.spatial_axis,
            )
            if self.spatial_axis is not None:
                # sharded: idx is cross-shard global; coords ride along
                neigh = res.xyz
            else:
                safe_g = jnp.clip(res.idx, 0, glayer.capacity - 1)
                neigh = glayer.xyz[safe_g]
            pe = estimate_points_eigen(neigh, res.valid)
            enough = pe.count >= self.min_points_to_fit
            l0, l2 = pe.eigenvalues[:, 0], pe.eigenvalues[:, 2]
            is_plane = l0 < self.plane_eigen_threshold * l2
            keep = valid & enough & is_plane
            w = jnp.where(keep, lm.weight * gate, 0.0)
            blocks.append(
                PairsPt2Pl(
                    local=local.xyz,
                    plane_centroid=pe.mean,
                    plane_normal=pe.eigenvectors[:, :, 0],
                    weight=w,
                    local_idx=jnp.where(
                        w > 0, jnp.arange(local.capacity, dtype=jnp.int32), -1
                    ),
                )
            )
            if state is not None:
                new_local[lm.local_layer] = (
                    state.local_paired[lm.local_layer] | (w > 0)
                )

        pt2pl = PairsPt2Pl(
            local=jnp.concatenate([b.local for b in blocks]),
            plane_centroid=jnp.concatenate([b.plane_centroid for b in blocks]),
            plane_normal=jnp.concatenate([b.plane_normal for b in blocks]),
            weight=jnp.concatenate([b.weight for b in blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in blocks]),
        )
        return (
            dict(pt2pl=pt2pl),
            MatchState(
                local_paired=new_local,
                global_paired=dict(state.global_paired),
            ) if state is not None else None,
            potential,
        )
