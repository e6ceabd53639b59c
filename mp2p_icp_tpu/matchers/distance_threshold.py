"""The workhorse pt2pt matcher.

Reference parity: mp2p_icp/src/Matcher_Points_DistanceThreshold.cpp:48-269 —
for each (transformed) local point, k-NN in the global layer; accept when
distSq < threshold^2 + (angularFactor * |p|)^2; honour the already-paired
bitfields; bump ``potential_pairings`` by nLocal * pairingsPerPoint.

TPU-first: the entire per-point loop (the reference's TBB parallel_reduce)
is one exact brute-force kNN on the MXU (ops.nn_bruteforce) + masked
writes. One-to-one exclusivity is
a deterministic segment-min (ops.nn.resolve_one_to_one) instead of the
reference's order-dependent (and racy under TBB) bitfield marking — tests
assert pair counts/geometry, not identity (SURVEY.md §7.3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
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
from mp2p_icp_tpu.ops.nn import resolve_one_to_one
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce


@dataclasses.dataclass(frozen=True)
class MatcherPointsDistanceThreshold(Matcher):
    """Params (reference: Matcher_Points_DistanceThreshold.h:60-71).

    ``threshold`` may be a core.params.Expression over ICP_ITERATION (the
    reference's Parameterizable dynamic-threshold feature, exercised by
    tests/test-mp2p_matcher_pt2pt_parameterizable.cpp) — it is evaluated
    in-trace each iteration.
    """

    threshold: object = 0.50  # float | Expression
    threshold_angular_deg: float = 0.0
    pairings_per_point: int = 1
    max_local_points_per_layer: int = 0
    allow_match_already_matched_global_points: bool = False
    allow_match_already_matched_points: bool = False
    layer_matches: Tuple[LayerMatch, ...] = (LayerMatch(),)
    k_per_cell: int = 16  # grid-hash candidate budget (TPU-specific)
    # TPU-specific: worst-case sensor range used to bound the angular term's
    # contribution to the grid cell size (the per-point threshold is
    # thr^2 + (angFactor*|p|)^2 — unbounded in principle).
    angular_range_hint: float = 100.0
    # TPU-specific: mesh axis name when the global map is spatially sharded
    # (set by parallel.spatial.make_spatial_align; SURVEY §5.7). The NN then
    # sweeps only this device's shard and all_gather-merges candidates.
    spatial_axis: object = None
    # number of shards on spatial_axis (static; set by make_spatial_align).
    # Cross-matcher paired bitfields and one-to-one claims then use GLOBAL
    # ids (shard * shard_capacity + local) over a mask of this many shard
    # capacities — identical on every device because the merged NN results
    # are replicated post-all_gather.
    spatial_num_shards: int = 1

    def search_radius(self) -> float:
        from mp2p_icp_tpu.core.params import Expression

        thr = self.threshold
        if isinstance(thr, Expression):
            # conservative static bound: evaluate at iteration 0
            thr = float(thr({"ICP_ITERATION": 0.0}))
        if self.threshold_angular_deg <= 0:
            return thr
        ang = float(jnp.deg2rad(self.threshold_angular_deg)) * self.angular_range_hint
        return float((thr**2 + ang**2) ** 0.5)

    def out_capacity(self, local_map: MetricMap) -> int:
        return sum(
            point_layers(local_map)[lm.local_layer].capacity * self.pairings_per_point
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
        # state=None: single-matcher fast path (the cross-matcher paired
        # bitfields carry no information, and their gathers/scatters cost
        # ~2 ms on this TPU — see ops.nn_bruteforce layout note)
        new_local = dict(state.local_paired) if state is not None else None
        new_global = dict(state.global_paired) if state is not None else None
        ang_factor_sq = (jnp.deg2rad(self.threshold_angular_deg)) ** 2
        from mp2p_icp_tpu.core.params import Expression

        if isinstance(self.threshold, Expression):
            thr = self.threshold(
                {"ICP_ITERATION": ctx.icp_iteration.astype(jnp.float32)}
            )
        else:
            thr = self.threshold

        for lm in self.layer_matches:
            local = point_layers(local_map)[lm.local_layer]
            glayer = point_layers(global_map)[lm.global_layer]
            pts, valid = transformed_local(local, pose)
            potential = potential + (
                local.count * self.pairings_per_point * gate.astype(jnp.int32)
            )
            if state is not None and not self.allow_match_already_matched_points:
                valid = valid & ~state.local_paired[lm.local_layer]
            valid = subsample_mask(valid, local.count, self.max_local_points_per_layer)

            # per-point adaptive threshold: thr^2 + angFactor^2 * |p|^2
            # (norm of the *transformed* point, as in the reference :151-153)
            norm_sq = jnp.sum(pts * pts, axis=-1)
            norm_sq = jnp.where(jnp.isfinite(norm_sq), norm_sq, 0.0)
            thr_sq = thr**2 + ang_factor_sq * norm_sq

            # exact kNN on the MXU (see ops.nn_bruteforce) — no grid, no
            # candidate budget, the per-point angular threshold is just a
            # per-query radius. Under spatial sharding res.idx is a GLOBAL
            # id and the paired/claim masks span all shards (see
            # spatial_num_shards).
            g_cap = glayer.capacity * (
                self.spatial_num_shards if self.spatial_axis is not None
                else 1
            )
            res = knn_bruteforce(
                pts,
                valid,
                glayer.xyz,
                glayer.valid_mask(),
                k=self.pairings_per_point,
                max_radius_sq=thr_sq,
                spatial_axis=self.spatial_axis,
            )
            keep = res.valid
            if not self.allow_match_already_matched_global_points:
                if state is not None:
                    gmask = state.global_paired[lm.global_layer]  # [g_cap]
                    safe = jnp.clip(res.idx, 0, gmask.shape[0] - 1)
                    keep = keep & ~gmask[safe]
                if self.pairings_per_point == 1:
                    one2one = resolve_one_to_one(
                        res.idx, res.dist_sq, keep, g_cap
                    )
                    keep = keep & one2one[:, None]

            w = jnp.where(keep, lm.weight * gate, 0.0)  # [Q, k]
            C = local.capacity
            k = self.pairings_per_point
            local_xyz = jnp.repeat(local.xyz, k, axis=0)
            local_idx = jnp.repeat(
                jnp.arange(C, dtype=jnp.int32), k, axis=0
            )
            gidx = res.idx.reshape(-1)
            safe_g = jnp.clip(gidx, 0, g_cap - 1)
            if res.xyz is not None:
                # sharded path: neighbour coords came back with the merge
                globl_xyz = res.xyz.reshape(-1, 3)
            else:
                globl_xyz = glayer.xyz[safe_g]
            # recorded ids translate back to the USER's map indices when
            # the global layer was crop-compacted (ctx.global_index_maps);
            # internal claim masks keep using cropped ids
            gm = (ctx.global_index_maps or {}).get(lm.global_layer)
            rec_gidx = (
                gidx if gm is None
                else gm[jnp.clip(gidx, 0, gm.shape[0] - 1)]
            )
            blocks.append(
                PairsPt2Pt(
                    local=local_xyz,
                    globl=globl_xyz,
                    weight=w.reshape(-1),
                    local_idx=jnp.where(w.reshape(-1) > 0, local_idx, -1),
                    global_idx=jnp.where(w.reshape(-1) > 0, rec_gidx, -1),
                )
            )

            # update paired masks
            if state is not None and not self.allow_match_already_matched_global_points:
                paired_local = jnp.any(w > 0, axis=-1)
                new_local[lm.local_layer] = (
                    state.local_paired[lm.local_layer] | paired_local
                )
                # scatter claims into an extended table; invalid rows land in
                # the dump slot [g_cap] and are sliced away
                wflat = w.reshape(-1) > 0
                gflat = jnp.where(wflat, safe_g, g_cap)
                claimed = (
                    jnp.zeros((g_cap + 1,), bool).at[gflat].max(wflat)
                )[:g_cap]
                new_global[lm.global_layer] = (
                    new_global[lm.global_layer] | claimed
                )

        pt2pt = PairsPt2Pt(
            local=jnp.concatenate([b.local for b in blocks]),
            globl=jnp.concatenate([b.globl for b in blocks]),
            weight=jnp.concatenate([b.weight for b in blocks]),
            local_idx=jnp.concatenate([b.local_idx for b in blocks]),
            global_idx=jnp.concatenate([b.global_idx for b in blocks]),
        )
        new_state = (
            MatchState(local_paired=new_local, global_paired=new_global)
            if state is not None else None
        )
        return (dict(pt2pt=pt2pt), new_state, potential)
