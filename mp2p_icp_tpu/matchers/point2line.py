"""Point-to-line matcher: fit a line to the kNN neighbourhood of each local
point and emit pt2ln pairings when the neighbourhood is line-like.

Reference parity: mp2p_icp/src/Matcher_Point2Line.cpp:46-163 — KNN(knn)
within distanceThreshold, eigen analysis of the neighbour set; accept as a
line when lambda0, lambda1 < lineEigenThreshold * lambda2; the line is
(centroid, largest eigenvector).

TPU-first: one batched kNN query + the batched closed-form eigen solver
(ops.eigen) over all neighbourhoods at once.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pairings import PairsPt2Ln
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
class MatcherPoint2Line(Matcher):
    """Params (reference: Matcher_Point2Line.h)."""

    distance_threshold: float = 0.40
    knn: int = 4
    line_eigen_threshold: float = 0.01
    min_points_to_fit: int = 4
    allow_match_already_matched_points: bool = False
    layer_matches: Tuple[LayerMatch, ...] = (LayerMatch(),)
    k_per_cell: int = 16

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

            res = knn_bruteforce(
                pts, valid, glayer.xyz, glayer.valid_mask(), k=self.knn,
                max_radius_sq=self.distance_threshold**2,
            )
            safe_g = jnp.clip(res.idx, 0, glayer.capacity - 1)
            neigh = glayer.xyz[safe_g]  # [Q, knn, 3]
            pe = estimate_points_eigen(neigh, res.valid)
            enough = pe.count >= self.min_points_to_fit
            l0, l1, l2 = (
                pe.eigenvalues[:, 0],
                pe.eigenvalues[:, 1],
                pe.eigenvalues[:, 2],
            )
            is_line = (l0 < self.line_eigen_threshold * l2) & (
                l1 < self.line_eigen_threshold * l2
            )
            keep = valid & enough & is_line
            w = jnp.where(keep, lm.weight * gate, 0.0)
            blocks.append(
                PairsPt2Ln(
                    local=local.xyz,
                    line_point=pe.mean,
                    line_dir=pe.eigenvectors[:, :, 2],
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

        pt2ln = PairsPt2Ln(
            local=jnp.concatenate([b.local for b in blocks]),
            line_point=jnp.concatenate([b.line_point for b in blocks]),
            line_dir=jnp.concatenate([b.line_dir for b in blocks]),
            weight=jnp.concatenate([b.weight for b in blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in blocks]),
        )
        return (
            dict(pt2ln=pt2ln),
            MatchState(
                local_paired=new_local,
                global_paired=dict(state.global_paired),
            ) if state is not None else None,
            potential,
        )
