"""Inlier-ratio matcher: keep the best fraction of NN pairs by distance.

Reference parity: mp2p_icp/src/Matcher_Points_InlierRatio.cpp:41-143 — NN
for each local point, sort all candidate pairs by distance, keep the best
``inliersRatio`` fraction.

TPU-first: the global sort becomes a masked quantile — compute the
distance value at rank ceil(ratio * n_valid) with ``jnp.sort`` over the
fixed-capacity distance vector and keep pairs below it. Identical set to
the reference's sort-truncate (up to ties at the cut).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pairings import PairsPt2Pt
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.matchers.base import (
    GridCache,
    point_layers,
    LayerMatch,
    MatchContext,
    Matcher,
    MatchState,
    subsample_mask,
    transformed_local,
)
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce

_BIG = 3.0e37


@dataclasses.dataclass(frozen=True)
class MatcherPointsInlierRatio(Matcher):
    """Params (reference: Matcher_Points_InlierRatio.h)."""

    inliers_ratio: float = 0.80
    max_local_points_per_layer: int = 0
    allow_match_already_matched_points: bool = False
    layer_matches: Tuple[LayerMatch, ...] = (LayerMatch(),)
    search_radius_hint: float = 2.0  # grid cell size (TPU-specific)
    k_per_cell: int = 16
    # TPU-specific: 'space' mesh axis when the global map is spatially
    # sharded (parallel.spatial; see matchers/adaptive.py note)
    spatial_axis: object = None

    def search_radius(self) -> float:
        return self.search_radius_hint

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
            valid = subsample_mask(valid, local.count, self.max_local_points_per_layer)

            # unbounded exact 1-NN (the reference's nn_single_search has no
            # radius limit either; the ratio cut below does the gating)
            res = knn_bruteforce(
                pts, valid, glayer.xyz, glayer.valid_mask(), k=1,
                spatial_axis=self.spatial_axis,
            )
            d = jnp.where(res.valid[:, 0], res.dist_sq[:, 0], _BIG)
            n_valid = jnp.sum((d < _BIG).astype(jnp.int32))
            n_keep = jnp.ceil(self.inliers_ratio * n_valid).astype(jnp.int32)
            d_sorted = jnp.sort(d)
            cutoff = d_sorted[jnp.clip(n_keep - 1, 0, d.shape[0] - 1)]
            keep = (d <= cutoff) & (d < _BIG)

            w = jnp.where(keep, lm.weight * gate, 0.0)
            gidx = res.idx[:, 0]
            if res.xyz is not None:  # sharded: coords rode the merge
                globl_xyz = res.xyz[:, 0]
            else:
                safe_g = jnp.clip(gidx, 0, glayer.capacity - 1)
                globl_xyz = glayer.xyz[safe_g]
            # translate recorded ids to user-map indices under crop
            gm = (ctx.global_index_maps or {}).get(lm.global_layer)
            rec_gidx = (
                gidx if gm is None
                else gm[jnp.clip(gidx, 0, gm.shape[0] - 1)]
            )
            blocks.append(
                PairsPt2Pt(
                    local=local.xyz,
                    globl=globl_xyz,
                    weight=w,
                    local_idx=jnp.where(
                        w > 0, jnp.arange(local.capacity, dtype=jnp.int32), -1
                    ),
                    global_idx=jnp.where(w > 0, rec_gidx, -1),
                )
            )
            if state is not None:
                new_local[lm.local_layer] = (
                    state.local_paired[lm.local_layer] | (w > 0)
                )

        pt2pt = PairsPt2Pt(
            local=jnp.concatenate([b.local for b in blocks]),
            globl=jnp.concatenate([b.globl for b in blocks]),
            weight=jnp.concatenate([b.weight for b in blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in blocks]),
            global_idx=jnp.concatenate([b.global_idx for b in blocks]),
        )
        return (
            dict(pt2pt=pt2pt),
            MatchState(
                local_paired=new_local,
                global_paired=dict(state.global_paired),
            ) if state is not None else None,
            potential,
        )
