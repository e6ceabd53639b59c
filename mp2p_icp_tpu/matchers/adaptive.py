"""Adaptive two-stage robust matcher.

Reference parity: mp2p_icp/src/Matcher_Adaptive.cpp:32-314 —
(1) radius-search up to ``planeSearchPoints`` neighbours per local point
    within ``absoluteMaxSearchDistance``; build a 50-bin histogram of the
    1st/2nd NN squared distances and take the ``confidenceInterval``
    quantile as the adaptive distance threshold (:191-218);
(2) per local point: if the neighbour set is plane-like
    (lambda0 < planeEigenThreshold * lambda{1,2}) and the local point is
    within ``planeMinimumDistance`` of the fitted plane, emit a pt2pl
    pairing; else emit up to ``maxPt2PtCorrespondences`` pt2pt pairs,
    stopping when err_i > err_0 * firstToSecondDistanceMax^2 (:227-271).

TPU-first: the histogram is a fixed-bin ``jnp.histogram``-style scatter;
the per-point candidate processing is fully batched (all neighbourhood
eigen fits in one call). Semantics match statistically, not bitwise
(SURVEY.md §7.3 — quantile from binned histogram, same as the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pairings import PairsPt2Pl, PairsPt2Pt
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

_BIG = 3.0e37
_HIST_BINS = 50  # reference: CHistogram(min, max, 50), Matcher_Adaptive.cpp:193


@dataclasses.dataclass(frozen=True)
class MatcherAdaptive(Matcher):
    """Params (reference: Matcher_Adaptive.h)."""

    # confidence_interval / absolute_max_search_distance may be
    # core.params.Expression instances over ICP_ITERATION — the
    # reference's Parameterizable contract (any numeric field can be a
    # runtime expression, Parameterizable.h:51-186 + DECLARE_PARAMETER in
    # Matcher_Adaptive.h); they evaluate IN-TRACE each iteration
    confidence_interval: object = 0.80
    first_to_second_distance_max: float = 1.2
    absolute_max_search_distance: object = 5.0
    minimum_corr_dist: float = 0.1
    enable_detect_planes: bool = False
    plane_search_points: int = 8
    plane_minimum_found_points: int = 4
    plane_minimum_distance: float = 0.10
    plane_eigen_threshold: float = 0.01
    max_pt2pt_correspondences: int = 1  # reference: Matcher_Adaptive.h:70
    allow_match_already_matched_points: bool = False
    # reference skips globals already claimed by an earlier matcher in the
    # same iteration and claims its own pt2pt globals
    # (Matcher_Adaptive.cpp:278-281, :293-299)
    allow_match_already_matched_global_points: bool = False
    layer_matches: Tuple[LayerMatch, ...] = (LayerMatch(),)
    k_per_cell: int = 16
    # number of shards on spatial_axis (static; set by make_spatial_align) —
    # global ids and claim masks span all shards
    spatial_num_shards: int = 1
    # TPU-specific: mesh axis name when the global map is spatially sharded
    # (set by parallel.spatial.make_spatial_align; SURVEY §5.7) — the NN
    # sweeps this device's shard only and all_gather-merges; neighbour
    # coordinates then come back in NNResult.xyz (cross-shard gathers are
    # impossible), which replaces every glayer.xyz[idx] gather below
    spatial_axis: object = None

    def search_radius(self) -> float:
        from mp2p_icp_tpu.core.params import Expression

        if isinstance(self.absolute_max_search_distance, Expression):
            # static upper bound for crop sizing: the expression's max
            # over a generous iteration range (crop margins need a
            # Python float before tracing)
            return max(
                float(self.absolute_max_search_distance(
                    {"ICP_ITERATION": float(i)}
                ))
                for i in range(0, 513)
            )
        return self.absolute_max_search_distance

    def _knn(self) -> int:
        return (
            self.plane_search_points
            if self.enable_detect_planes
            else self.max_pt2pt_correspondences
        )

    def out_capacity(self, local_map: MetricMap) -> int:
        return sum(
            point_layers(local_map)[lm.local_layer].capacity
            * self.max_pt2pt_correspondences
            for lm in self.layer_matches
        )

    def out_capacity_pt2pl(self, local_map: MetricMap) -> int:
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
        pt_blocks, pl_blocks = [], []
        potential = jnp.asarray(0, jnp.int32)
        new_local = dict(state.local_paired) if state is not None else None
        new_global = dict(state.global_paired) if state is not None else None
        knn = self._knn()
        from mp2p_icp_tpu.core.params import Expression

        env = {"ICP_ITERATION": ctx.icp_iteration.astype(jnp.float32)}
        conf_int = (
            self.confidence_interval(env)
            if isinstance(self.confidence_interval, Expression)
            else self.confidence_interval
        )
        amsd = (
            self.absolute_max_search_distance(env)
            if isinstance(self.absolute_max_search_distance, Expression)
            else self.absolute_max_search_distance
        )

        for lm in self.layer_matches:
            local = point_layers(local_map)[lm.local_layer]
            glayer = point_layers(global_map)[lm.global_layer]
            pts, valid = transformed_local(local, pose)
            potential = potential + local.count * gate.astype(jnp.int32)
            if state is not None and not self.allow_match_already_matched_points:
                valid = valid & ~state.local_paired[lm.local_layer]

            res = knn_bruteforce(
                pts, valid, glayer.xyz, glayer.valid_mask(), k=knn,
                max_radius_sq=amsd**2,
                spatial_axis=self.spatial_axis,
            )

            # --- stage 1: adaptive threshold from 1st/2nd NN histogram
            d12 = jnp.where(res.valid[:, : min(2, knn)],
                            res.dist_sq[:, : min(2, knn)], _BIG).reshape(-1)
            sample_ok = d12 < _BIG
            d_min = jnp.min(jnp.where(sample_ok, d12, _BIG))
            d_max = jnp.max(jnp.where(sample_ok, d12, -_BIG))
            span = jnp.maximum(d_max - d_min, 1e-12)
            bins = jnp.clip(
                ((d12 - d_min) / span * _HIST_BINS).astype(jnp.int32), 0, _HIST_BINS - 1
            )
            hist = (
                jnp.zeros((_HIST_BINS + 1,), jnp.float32)
                .at[jnp.where(sample_ok, bins, _HIST_BINS)]
                .add(1.0)
            )[:_HIST_BINS]
            total = jnp.maximum(jnp.sum(hist), 1.0)
            cdf = jnp.cumsum(hist) / total
            # reference: confidenceIntervalsFromHistogram(..., 1-CI) — the
            # upper limit is the (1+CI)/2 quantile of the binned samples
            q = (1.0 + conf_int) * 0.5
            bin_idx = jnp.argmax(cdf >= q)
            ci_high = d_min + (bin_idx + 1).astype(jnp.float32) / _HIST_BINS * span
            max_corr_dist_sq = jnp.maximum(self.minimum_corr_dist**2, ci_high)

            # --- stage 2a: plane detection per local point
            if res.xyz is not None:  # sharded: coords rode the merge
                neigh = res.xyz  # [Q, knn, 3]
            else:
                safe_g = jnp.clip(res.idx, 0, glayer.capacity - 1)
                neigh = glayer.xyz[safe_g]  # [Q, knn, 3]
            plane_w = jnp.zeros((local.capacity,), jnp.float32)
            plane_centroid = jnp.zeros((local.capacity, 3), jnp.float32)
            plane_normal = jnp.zeros((local.capacity, 3), jnp.float32)
            is_plane = jnp.zeros((local.capacity,), bool)
            if self.enable_detect_planes:
                pe = estimate_points_eigen(neigh, res.valid)
                l0, l1, l2 = (pe.eigenvalues[:, 0], pe.eigenvalues[:, 1],
                              pe.eigenvalues[:, 2])
                plane_like = (l0 < self.plane_eigen_threshold * l2) & (
                    l0 < self.plane_eigen_threshold * l1
                ) & (pe.count >= self.plane_minimum_found_points)
                n = pe.eigenvectors[:, :, 0]
                # distance of the transformed local point to the plane.
                # (Deviation: the reference checks the *untransformed* local
                # point against the global plane, Matcher_Adaptive.cpp:254 —
                # which only makes sense when the guess is near identity;
                # using the transformed point is the intended geometry.)
                dist_pl = jnp.abs(jnp.sum(n * (pts - pe.mean), axis=-1))
                is_plane = valid & plane_like & (dist_pl < self.plane_minimum_distance)
                plane_w = jnp.where(is_plane, lm.weight * gate, 0.0)
                plane_centroid = pe.mean
                plane_normal = n

            pl_blocks.append(
                PairsPt2Pl(
                    local=local.xyz,
                    plane_centroid=plane_centroid,
                    plane_normal=plane_normal,
                    weight=plane_w,
                    local_idx=jnp.where(
                        plane_w > 0, jnp.arange(local.capacity, dtype=jnp.int32), -1
                    ),
                )
            )

            # --- stage 2b: pt2pt for non-plane locals
            kk = min(knn, self.max_pt2pt_correspondences)
            dk = res.dist_sq[:, :kk]
            vk = res.valid[:, :kk]
            first = dk[:, :1]
            ratio_ok = dk <= first * (self.first_to_second_distance_max**2)
            ratio_ok = ratio_ok.at[:, 0].set(True)
            # reference breaks at first ratio violation — emulate with cumand
            ratio_ok = jnp.cumprod(ratio_ok.astype(jnp.int32), axis=1).astype(bool)
            keep = vk & ratio_ok & (dk < max_corr_dist_sq)
            keep = keep & valid[:, None] & ~is_plane[:, None]
            gidx = res.idx[:, :kk]
            g_cap = glayer.capacity * (
                self.spatial_num_shards if self.spatial_axis is not None
                else 1
            )
            if (
                state is not None
                and not self.allow_match_already_matched_global_points
            ):
                # skip globals an earlier matcher already paired
                # (Matcher_Adaptive.cpp:278-281)
                gmask = state.global_paired[lm.global_layer]  # [g_cap]
                keep = keep & ~gmask[jnp.clip(gidx, 0, g_cap - 1)]
            w = jnp.where(keep, lm.weight * gate, 0.0)
            if res.xyz is not None:
                globl_xyz = res.xyz[:, :kk].reshape(-1, 3)
            else:
                safe_gk = jnp.clip(gidx, 0, glayer.capacity - 1)
                globl_xyz = glayer.xyz[safe_gk].reshape(-1, 3)
            # translate recorded ids to user-map indices under crop
            gm = (ctx.global_index_maps or {}).get(lm.global_layer)
            gflat_rec = gidx.reshape(-1)
            if gm is not None:
                gflat_rec = gm[jnp.clip(gflat_rec, 0, gm.shape[0] - 1)]
            pt_blocks.append(
                PairsPt2Pt(
                    local=jnp.repeat(local.xyz, kk, axis=0),
                    globl=globl_xyz,
                    weight=w.reshape(-1),
                    local_idx=jnp.where(
                        w.reshape(-1) > 0,
                        jnp.repeat(jnp.arange(local.capacity, dtype=jnp.int32), kk),
                        -1,
                    ),
                    global_idx=jnp.where(w.reshape(-1) > 0, gflat_rec, -1),
                )
            )
            if state is not None:
                paired = (jnp.any(w > 0, axis=-1)) | (plane_w > 0)
                new_local[lm.local_layer] = (
                    state.local_paired[lm.local_layer] | paired
                )
                if not self.allow_match_already_matched_global_points:
                    # claim this matcher's pt2pt globals (the reference
                    # marks globals only on the pt2pt path,
                    # Matcher_Adaptive.cpp:293-299); invalid rows land in
                    # the dump slot [g_cap] and are sliced away
                    wflat = w.reshape(-1) > 0
                    gflat = jnp.where(
                        wflat, jnp.clip(gidx.reshape(-1), 0, g_cap - 1),
                        g_cap,
                    )
                    claimed = (
                        jnp.zeros((g_cap + 1,), bool).at[gflat].max(wflat)
                    )[:g_cap]
                    new_global[lm.global_layer] = (
                        new_global[lm.global_layer] | claimed
                    )

        out = {}
        out["pt2pt"] = PairsPt2Pt(
            local=jnp.concatenate([b.local for b in pt_blocks]),
            globl=jnp.concatenate([b.globl for b in pt_blocks]),
            weight=jnp.concatenate([b.weight for b in pt_blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in pt_blocks]),
            global_idx=jnp.concatenate([b.global_idx for b in pt_blocks]),
        )
        out["pt2pl"] = PairsPt2Pl(
            local=jnp.concatenate([b.local for b in pl_blocks]),
            plane_centroid=jnp.concatenate([b.plane_centroid for b in pl_blocks]),
            plane_normal=jnp.concatenate([b.plane_normal for b in pl_blocks]),
            weight=jnp.concatenate([b.weight for b in pl_blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in pl_blocks]),
        )
        return (
            out,
            MatchState(
                local_paired=new_local,
                global_paired=new_global,
            ) if state is not None else None,
            potential,
        )
