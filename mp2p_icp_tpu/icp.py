"""The ICP orchestrator — fused TPU registration loop.

Reference parity: mp2p_icp/src/ICP.cpp:36-382 ``ICP::align()`` — the
matcher->solver->termination->quality pipeline with per-iteration module
gating, oscillation-aware stall detection, quality checkpoints and final
covariance.

TPU-first redesign: the whole iteration loop is one ``lax.while_loop``
compiled into a single XLA program — zero host round-trips per iteration
(the reference pays per-iteration KD-tree queries + virtual dispatch).
Matcher/solver schedules (``runFromIteration``...) become traced 0/1 gates
and ``lax.cond`` branches. Pairings ride in the loop carry (static shapes),
so the final pairings for quality/covariance come for free.

Call stack mirror of the reference (SURVEY.md §3.1):
  align()                      -> ICP.align (host prep + jit dispatch)
  run_matchers / Pairings      -> _run_matchers (batched NN, masked blocks)
  run_solvers first-wins       -> _run_solvers (lax.cond chain)
  termination / stall checks   -> inside _loop_body via se3.delta_norms
  evaluate_quality             -> weighted evaluator sum after the loop
  covariance                   -> analytic (H)^-1 (covariance.py)
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pairings import (
    Pairings,
    PairsLn2Ln,
    PairsPl2Pl,
    PairsPt2Ln,
    PairsPt2Pl,
    PairsPt2Pt,
)
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.covariance import covariance as compute_covariance
from mp2p_icp_tpu.matchers.base import (
    MatchContext,
    MatchState,
    point_layers,
    transformed_local,
)
from mp2p_icp_tpu.quality.paired_ratio import QualityPairedRatio
from mp2p_icp_tpu.solvers.gauss_newton import SE3Prior


class IterTermReason(enum.IntEnum):
    """Reference: mp2p_icp/include/mp2p_icp/IterTermReason.h."""

    UNDEFINED = 0
    NO_PAIRINGS = 1
    SOLVER_ERROR = 2
    MAX_ITERATIONS = 3
    STALLED = 4
    HOOK_REQUEST = 5
    QUALITY_CHECKPOINT_FAILED = 6


_RUNNING = 0  # internal sentinel while the loop is live


@dataclasses.dataclass(frozen=True)
class ICPParameters:
    """Reference: mp2p_icp/include/mp2p_icp/Parameters.h:34-106."""

    max_iterations: int = 40
    min_abs_step_trans: float = 5e-4
    min_abs_step_rot: float = 1e-4
    # (iteration, min quality) pairs; reference default {50:0.05, 100:0.10}
    quality_checkpoints: Tuple[Tuple[int, float], ...] = ((50, 0.05), (100, 0.10))
    debug_print_iteration_progress: bool = False
    # record per-iteration poses/pairing counts (reference: LogRecord
    # iterationsDetails, LogRecord.h:58-71) — runs the loop as a bounded
    # lax.scan instead of while_loop (always max_iterations steps)
    record_iterations: bool = False
    # additionally record a decimated per-iteration Pairings snapshot
    # (reference keeps the FULL Pairings per iteration for icp-log-viewer
    # playback, LogRecord.h:58-71 / ICP.cpp:232-241; the TPU record is
    # capacity-bounded so the recording scan stays static-shaped)
    record_pairings: bool = False
    record_pairings_capacity: int = 512
    # --- scan-to-LARGE-map cropping (TPU-specific) ---------------------
    # The reference registers scans against multi-million-point accumulated
    # maps via lazy KD-trees (metricmap.cpp:784-802). The TPU equivalent:
    # when a global point layer's capacity exceeds ``crop_capacity``, the
    # align program first compacts it to the points inside the transformed
    # local scan's bounding box + margin (one argsort+gather at guess pose,
    # inside the same jit) so the per-iteration MXU NN sweeps only nearby
    # candidates. Maps still larger than the in-VMEM kernel budget stream
    # through HBM superblocks (ops.nn_bruteforce.STREAM_BLOCK).
    # None = auto (crop whenever it shrinks the map); False disables.
    crop_to_local_bbox: Optional[bool] = None
    crop_capacity: int = 131072
    # margin beyond the matchers' max search radius, to absorb intra-align
    # pose correction (the crop is computed once, at the guess pose)
    crop_extra_margin: float = 5.0
    # --- per-iteration user hook (reference: ICP.cpp:286-303) -----------
    # TPU-first redesign of the reference's host callback: a TRACED
    # predicate ``hook(iteration, R, t, n_pairings) -> bool`` compiled into
    # the fused loop body after every solver step; a True result aborts the
    # align with IterTermReason.HOOK_REQUEST. Because it is traced (called
    # once at compile time on tracers), it stays a zero-host-round-trip
    # on-device check and works under vmap — unlike a host io_callback,
    # which hangs through the axon TPU tunnel (measured) and cannot be
    # vmapped. For host-side observation inside the hook use
    # jax.debug.callback/print; to truly stop from host logic, use
    # record_iterations and inspect afterwards.
    iteration_hook: Optional[Callable] = None
    # --- automatic debug-file generation (reference: Parameters.h:66-96,
    # ICP.cpp:384-467 ICP::save_log_file) --------------------------------
    # when True every align() saves a templated .icplog.npz LogRecord
    # (host-side, post-dispatch — the traced program is unchanged unless
    # save_iteration_details also forces the recording scan)
    generate_debug_files: bool = False
    # store per-iteration poses/pairings in the record (LogRecord
    # iterationsDetails; implies record_iterations+record_pairings)
    save_iteration_details: bool = False
    # keep 1 of N recorded iterations in the saved file (Parameters.h:79-83)
    decimation_iteration_details: int = 10
    # generate only 1 of N log files (Parameters.h:85-88)
    decimation_debug_files: int = 1
    # $UNIQUE_ID / $GLOBAL_ID / $GLOBAL_LABEL / $LOCAL_ID / $LOCAL_LABEL
    # are substituted (Parameters.h:90-92)
    debug_file_name_format: str = (
        "icp-run-$UNIQUE_ID-local-$LOCAL_ID$LOCAL_LABEL-"
        "global-$GLOBAL_ID$GLOBAL_LABEL.icplog.npz"
    )
    # host functors applied to a COPY of each map before logging
    # (Parameters.h:94-96); may return a replacement map or None (in-place)
    functor_before_logging_local: Optional[Callable] = None
    functor_before_logging_global: Optional[Callable] = None


class ICPResults(NamedTuple):
    """Reference: mp2p_icp/include/mp2p_icp/Results.h:29-58."""

    optimal_tf: Pose
    # 1.0 unless a SolverHorn(estimate_scale=True) is present (reference:
    # Results.h:35-36 optimalScale; the scale formula itself is the
    # reference's optimal_tf_horn.cpp:177-195)
    optimal_scale: jax.Array
    n_iterations: jax.Array
    termination_reason: jax.Array  # IterTermReason value
    quality: jax.Array
    final_pairings: Pairings
    covariance: jax.Array  # [6, 6]
    # populated only when ICPParameters.record_iterations (else None):
    iteration_poses: Optional[Pose] = None  # stacked [max_iterations]
    iteration_pair_counts: Optional[jax.Array] = None  # [max_iterations]
    # per-iteration decimated Pairings (record_pairings; leading dim =
    # max_iterations)
    iteration_pairings: Optional[Pairings] = None


def _layer_shape_key(v):
    """Hashable jit-cache key for a map layer: point layers key on
    capacity; other layer types (voxel grids for quality evaluators, ...)
    key on their leaf shapes."""
    cap = getattr(v, "capacity", None)
    if cap is not None:
        return cap
    return tuple(jnp.shape(x) for x in jax.tree.leaves(v))


class _LoopCarry(NamedTuple):
    pose: Pose
    prev_pose: Pose
    iteration: jax.Array
    reason: jax.Array
    pairings: Pairings
    # persistent runUntilTranslationCorrectionSmallerThan latches,
    # [n_solvers] bool (Solver.cpp:44-60 perSolverPersistentData)
    solver_finished: jax.Array


@dataclasses.dataclass
class ICP:
    """Module container + align() entry point (reference: ICP.h:59-257).

    matchers / solvers are static module lists (from YAML or code);
    quality_evaluators evaluate the final registration.
    """

    matchers: Sequence = ()
    solvers: Sequence = ()
    quality_evaluators: Sequence = (QualityPairedRatio(),)
    quality_weights: Sequence = None

    def __post_init__(self):
        if not self.quality_weights:
            self.quality_weights = [1.0] * len(self.quality_evaluators)
        self._jit_cache = {}

    # ------------------------------------------------------------- schedule
    @staticmethod
    def _module_window(m, max_iter: int):
        lo = m.run_from_iteration
        hi = m.run_up_to_iteration if m.run_up_to_iteration > 0 else max_iter
        return lo, min(hi, max_iter)

    def _schedule_segments(self, params, matchers):
        """Cut [0, max_iterations) at every module window boundary and
        return [(a, b, active_matcher_flags, active_solver_flags), ...].

        Module iteration windows (runFromIteration/runUpToIteration,
        reference: Matcher.h:99-101, Solver.h:91-97) are STATIC, so instead
        of gating modules at runtime the align loop runs one
        lax.while_loop per segment containing ONLY that segment's active
        modules. This matters doubly under vmap (batched registration):
        a lax.cond there executes BOTH branches, so e.g. the KITTI
        Horn->GN schedule would pay every matcher and solver every
        iteration (measured 55 -> 21 ms per 8-batch after segmentation)."""
        mods = list(matchers) + list(self.solvers)
        bounds = {0, params.max_iterations}
        for m in mods:
            lo, hi = self._module_window(m, params.max_iterations)
            bounds.add(min(lo, params.max_iterations))
            bounds.add(min(hi + 1, params.max_iterations))
        # quality checkpoints are segment boundaries too: the FULL
        # evaluator stack runs in-trace exactly once per checkpoint,
        # between segments (reference: ICP.cpp:259-283 evaluates
        # quality_evaluators_ at the checkpoint iteration and aborts)
        for it, _min_q in params.quality_checkpoints:
            if 0 <= it < params.max_iterations:
                bounds.add(it + 1)
        cuts = sorted(bounds)
        segs = []
        for a, b in zip(cuts[:-1], cuts[1:]):
            def covers(m):
                lo, hi = self._module_window(m, params.max_iterations)
                return m.enabled and lo <= a and hi >= b - 1

            segs.append(
                (
                    a,
                    b,
                    tuple(covers(m) for m in matchers),
                    tuple(covers(s) for s in self.solvers),
                )
            )
        return segs

    # ------------------------------------------------------------- matchers
    def _run_matchers(self, matchers, active, grids, global_layers,
                      local_layers, pose, iteration, gidx_maps=None):
        """Run the segment's active matchers, concatenating their
        fixed-capacity blocks into one Pairings (reference: run_matchers,
        Matcher.cpp:35-87). Inactive matchers contribute all-zero blocks —
        statically, so XLA dead-code-eliminates them — keeping the Pairings
        pytree structure identical across schedule segments."""
        # The paired-bitfield bookkeeping only matters when several matchers
        # run in the SAME segment (reference: bitfields deduplicate across
        # the matcher pipeline). Windowed single-matcher segments (the KITTI
        # schedule) skip it entirely: its gathers/scatters on small tensors
        # are ~ms-class on this TPU. Under spatial sharding the global masks
        # span all shards (see MatchState.create).
        g_scale = max(
            (
                getattr(m, "spatial_num_shards", 1)
                if getattr(m, "spatial_axis", None) is not None
                else 1
            )
            for m in matchers
        )
        state = (
            MatchState.create(local_layers, global_layers, g_scale)
            if sum(active) > 1 else None
        )
        ctx = MatchContext(
            icp_iteration=iteration, global_index_maps=gidx_maps or None
        )
        acc: Dict[str, list] = {k: [] for k in ("pt2pt", "pt2ln", "pt2pl", "ln2ln", "pl2pl")}
        potential = jnp.asarray(0, jnp.int32)
        for m, on in zip(matchers, active):
            def run_m(m=m, state=state):
                return m.match(
                    grids, global_layers, local_layers, pose, state, ctx
                )

            if on:
                blocks, state, pot = run_m()
            else:
                shapes = jax.eval_shape(run_m)
                blocks = jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), shapes[0]
                )
                pot = jnp.asarray(0, jnp.int32)
            potential = potential + pot
            for k, v in blocks.items():
                acc[k].append(v)

        def cat(blocks, cls):
            if not blocks:
                return cls.empty(1)
            fields = {}
            for f in dataclasses.fields(cls):
                fields[f.name] = jnp.concatenate(
                    [getattr(b, f.name) for b in blocks], axis=0
                )
            return cls(**fields)

        return Pairings(
            pt2pt=cat(acc["pt2pt"], PairsPt2Pt),
            pt2ln=cat(acc["pt2ln"], PairsPt2Ln),
            pt2pl=cat(acc["pt2pl"], PairsPt2Pl),
            ln2ln=cat(acc["ln2ln"], PairsLn2Ln),
            pl2pl=cat(acc["pl2pl"], PairsPl2Pl),
            potential_pairings=potential,
        )

    # -------------------------------------------------------------- solvers
    def _run_solvers(self, pairings, pose, iteration, step_trans, has_step,
                     prior, active, finished):
        """First enabled solver wins (reference: ICP::run_solvers,
        ICP.cpp:469-479). Iteration windows are resolved statically by the
        schedule segmentation (``active``); only the dynamic
        runUntilTranslationCorrectionSmallerThan gate still needs a runtime
        cond chain. That gate follows Solver.cpp:44-60 exactly: the solver
        runs until the LAST ICP STEP INCREMENT's translation norm
        (``step_trans``; sc.lastIcpStepIncrement, unset on the first
        iteration -> ``has_step``) drops below the threshold, at which point
        a persistent per-solver 'finished' latch (``finished`` [n_solvers]
        bool, part of the loop carry) disables it for every remaining
        iteration — handing off to the next solver in the list.

        Returns (new_pose, new_finished)."""
        act = [s for s, on in zip(self.solvers, active) if on]
        if not act:
            return pose, finished
        dynamic = any(
            s.run_until_translation_correction_smaller_than > 0 for s in act
        )
        if not dynamic:
            # first statically-active solver wins outright
            return act[0].solve(pairings, pose, prior, iteration=iteration), finished
        result = pose
        taken = jnp.asarray(False)
        new_finished = finished
        for i, (s, on) in enumerate(zip(self.solvers, active)):
            if not on:
                continue
            thr = s.run_until_translation_correction_smaller_than
            if thr > 0:
                # latch only when this solver is actually consulted
                # (earlier solvers did not win), like the reference's
                # per-solver persistent data
                trig = (~taken) & has_step & (step_trans < thr)
                fin_i = finished[i] | trig
                new_finished = new_finished.at[i].set(fin_i)
                g = (~taken) & ~fin_i
            else:
                g = ~taken
            result = jax.lax.cond(
                g,
                lambda p=pairings, s=s, pose=pose, prior=prior: s.solve(
                    p, pose, prior, iteration=iteration),
                lambda r=result: r,
            )
            taken = taken | g
        return result, new_finished

    # ---------------------------------------------------------------- align
    def align(
        self,
        local_map: MetricMap | Dict[str, PointCloud],
        global_map: MetricMap | Dict[str, PointCloud],
        guess: Pose,
        params: Optional[ICPParameters] = None,
        prior: Optional[SE3Prior] = None,
    ) -> ICPResults:
        """Register local onto global starting from guess."""
        params = params or ICPParameters()
        if not self.matchers or not self.solvers:
            raise ValueError("ICP requires at least one matcher and one solver")
        if params.generate_debug_files and params.save_iteration_details:
            # the reference stores per-iteration detail in the LogRecord
            # when saveIterationDetails is on (Parameters.h:71-77) — flip
            # the recording scan on before the jit key is formed
            if not (params.record_iterations and params.record_pairings):
                params = dataclasses.replace(
                    params, record_iterations=True, record_pairings=True
                )
        g_layers = point_layers(global_map)
        l_layers = point_layers(local_map)
        if not g_layers or not l_layers:
            raise ValueError("empty input maps")
        matchers = tuple(self.matchers)
        # solvers/quality are part of the key: ICP is a mutable dataclass,
        # so swapping a module after a first align must not silently reuse
        # the stale compiled program
        key = (
            params,
            matchers,
            tuple(self.solvers),
            tuple(self.quality_evaluators),
            tuple(self.quality_weights),
            prior is not None,
            tuple(sorted((k, _layer_shape_key(v))
                         for k, v in g_layers.items())),
            tuple(sorted((k, _layer_shape_key(v))
                         for k, v in l_layers.items())),
        )
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                functools.partial(self._align_full, params, matchers)
            )
        results = self._jit_cache[key](g_layers, l_layers, guess, prior)
        if params.generate_debug_files:
            from mp2p_icp_tpu.io.debug_dump import save_icp_debug_file

            save_icp_debug_file(
                params, local_map, global_map, guess, results
            )
        return results

    # ------------------------------------------------------------- cropping
    def _crop_globals(self, params, matchers, g_layers, l_layers, guess):
        """Compact each large matcher-referenced global layer to the points
        inside the transformed local bbox + margin (fixed crop_capacity, so
        shapes stay static). TPU answer to the reference's lazy KD-tree over
        a huge accumulated map (metricmap.cpp:784-802; kd-tree leaf tuning
        Matcher_Points_Base.cpp:104-114): one argsort-compaction at the
        guess pose replaces the tree, and the per-iteration NN then sweeps
        only the local neighbourhood.

        Returns (cropped_layers, index_maps): index_maps[name] is the
        [crop_capacity] i32 table mapping cropped row -> ORIGINAL map index
        (-1 padding) for every layer that was compacted, so recorded
        pairings can be translated back to user-map indices."""
        gnames = {lm.global_layer for m in matchers for lm in m.layer_matches}
        lnames = {lm.local_layer for m in matchers for lm in m.layer_matches}
        if params.crop_to_local_bbox is False:
            return g_layers, {}
        M = params.crop_capacity
        todo = [
            n for n in sorted(gnames)
            if n in g_layers and g_layers[n].capacity > M
        ]
        if not todo:
            return g_layers, {}
        margin = params.crop_extra_margin + max(
            (m.search_radius() for m in matchers), default=0.0
        )
        big = jnp.float32(3.0e37)
        los, his = [], []
        for name in sorted(lnames):
            if name not in l_layers:
                continue
            pts, valid = transformed_local(l_layers[name], guess)
            los.append(jnp.min(jnp.where(valid[:, None], pts, big), axis=0))
            his.append(jnp.max(jnp.where(valid[:, None], pts, -big), axis=0))
        lo = jnp.min(jnp.stack(los), axis=0) - margin
        hi = jnp.max(jnp.stack(his), axis=0) + margin

        out = dict(g_layers)
        index_maps = {}
        for name in todo:
            g = g_layers[name]
            inside = g.valid_mask() & jnp.all(
                (g.xyz >= lo) & (g.xyz <= hi), axis=1
            )
            # overflow -> even-stride decimation over the in-box points:
            # plain truncation would keep whichever keyframes were merged
            # first and spatially bias the candidate set (measured: 0.22
            # SE(3)-log error on a corridor map vs <0.03 with striding)
            rank = jnp.cumsum(inside.astype(jnp.int32)) - 1
            total = jnp.sum(inside.astype(jnp.int32))
            stride = jnp.maximum((total + M - 1) // M, 1)
            inside = inside & (rank % stride == 0)
            # stable argsort(~inside): the first sum(inside) slots are the
            # in-box points in original order -> valid rows stay leading.
            # (A cumsum+scatter compaction measures ~9% SLOWER end-to-end
            # here — XLA's 1M-element scatter lowering loses to its sort.)
            order = jnp.argsort(~inside)[:M]
            count = jnp.minimum(jnp.sum(inside.astype(jnp.int32)), M)
            keep = jnp.arange(M) < count
            xyz = jnp.where(
                keep[:, None], g.xyz[order], PointCloud.PAD_VALUE
            )

            def take_ch(ch):
                return None if ch is None else jnp.where(keep, ch[order], 0.0)

            out[name] = PointCloud(
                xyz=xyz,
                count=count,
                intensity=take_ch(g.intensity),
                ring=take_ch(g.ring),
                time=take_ch(g.time),
                normals=(
                    None if g.normals is None
                    else jnp.where(keep[:, None], g.normals[order], 0.0)
                ),
            )
            index_maps[name] = jnp.where(
                keep, order.astype(jnp.int32), -1
            )
        return out, index_maps

    def _align_full(self, params, matchers, g_layers, l_layers, guess, prior):
        """Single fused program: the whole ICP loop + quality + covariance.
        One device dispatch per align — no per-call eager ops or host syncs
        (those dominated wall time through the TPU tunnel). Matchers use
        exact MXU brute-force NN, so no spatial index is built at all;
        large global maps are first cropped to the guess neighbourhood
        (see _crop_globals)."""
        g_layers, gidx_maps = self._crop_globals(
            params, matchers, g_layers, l_layers, guess
        )
        return self._align_core(params, matchers, {}, g_layers, l_layers,
                                guess, prior, gidx_maps=gidx_maps)

    def _quality_stack(self, pairings, grids, g_layers, l_layers, pose,
                       iteration):
        """Weighted full-evaluator-stack quality with hard-discard → 0
        (reference: evaluate_quality, ICP.cpp:608-634). Used both for the
        final result and at in-loop quality checkpoints."""
        ctx = MatchContext(icp_iteration=iteration)
        q_acc = jnp.asarray(0.0)
        w_acc = 0.0
        discard = jnp.asarray(False)
        for ev, w in zip(self.quality_evaluators, self.quality_weights):
            qr = ev.evaluate(
                pairings,
                grids=grids,
                global_map=g_layers,
                local_map=l_layers,
                pose=pose,
                ctx=ctx,
            )
            q_acc = q_acc + w * qr.quality
            w_acc += w
            discard = discard | qr.hard_discard
        return jnp.where(discard, 0.0, q_acc / max(w_acc, 1e-12))

    def _apply_quality_checkpoint(self, params, carry, seg_end, grids,
                                  g_layers, l_layers):
        """If `seg_end - 1` is a checkpoint iteration, evaluate the FULL
        configured quality stack on the carry's current solution and
        abort with QUALITY_CHECKPOINT_FAILED below the threshold
        (reference: ICP.cpp:259-283 — the checkpoint runs after the
        iteration's solver/stall checks, with the current pairings and
        optimal pose). Static no-op for non-checkpoint boundaries."""
        thresholds = [
            min_q for it, min_q in params.quality_checkpoints
            if it + 1 == seg_end
        ]
        if not thresholds:
            return carry
        min_q = max(thresholds)
        q = self._quality_stack(
            carry.pairings, grids, g_layers, l_layers, carry.pose,
            carry.iteration,
        )
        fail = (
            (carry.reason == _RUNNING)
            & (carry.iteration == seg_end)
            & (q < min_q)
        )
        return carry._replace(
            reason=jnp.where(
                fail,
                jnp.asarray(
                    IterTermReason.QUALITY_CHECKPOINT_FAILED, jnp.int32
                ),
                carry.reason,
            )
        )

    def _align_core(self, params, matchers, grids, g_layers, l_layers,
                    guess, prior, gidx_maps=None):
        eps_t = params.min_abs_step_trans
        eps_r = params.min_abs_step_rot

        def make_body(m_active, s_active):
            def body(carry: _LoopCarry) -> _LoopCarry:
                pairings = self._run_matchers(
                    matchers, m_active, grids, g_layers, l_layers,
                    carry.pose, carry.iteration, gidx_maps
                )
                no_pairs = pairings.size() == 0
                # the reference's sc.lastIcpStepIncrement test
                # (Solver.cpp:52): the RAW translation norm of the relative
                # pose prev^-1 * cur — |R_prev^T (t_i - t_{i-1})| =
                # |t_i - t_{i-1}| (rotation preserves norms), NOT the
                # SE(3)-log translation (which differs under large
                # rotation steps); unset (has_step=False) at iteration 0
                step_trans = jnp.linalg.norm(
                    carry.pose.t - carry.prev_pose.t
                )
                has_step = carry.iteration > 0
                new_pose, solver_finished = self._run_solvers(
                    pairings, carry.pose, carry.iteration, step_trans,
                    has_step, prior, s_active, carry.solver_finished,
                )
                solver_ok = jnp.all(jnp.isfinite(new_pose.t)) & jnp.all(
                    jnp.isfinite(new_pose.R)
                )
                # step-size + oscillation termination (ICP.cpp:191-229)
                dt1, dr1 = se3.delta_norms(carry.pose, new_pose)
                dt2, dr2 = se3.delta_norms(carry.prev_pose, new_pose)
                stalled = ((dt1 < eps_t) & (dr1 < eps_r)) | (
                    (dt2 < eps_t) & (dr2 < eps_r)
                )
                # quality checkpoints (reference: ICP.cpp:259-283) run the
                # FULL evaluator stack BETWEEN segments — checkpoint
                # iterations are segment boundaries (_schedule_segments),
                # so the in-loop body carries no quality work at all
                reason = jnp.where(
                    no_pairs,
                    IterTermReason.NO_PAIRINGS,
                    jnp.where(
                        ~solver_ok,
                        IterTermReason.SOLVER_ERROR,
                        jnp.where(
                            stalled, IterTermReason.STALLED, _RUNNING
                        ),
                    ),
                ).astype(jnp.int32)
                keep_new = solver_ok & ~no_pairs
                pose_out = Pose(
                    jnp.where(keep_new, new_pose.R, carry.pose.R),
                    jnp.where(keep_new, new_pose.t, carry.pose.t),
                )
                if params.iteration_hook is not None:
                    # user hook with stop request (reference ICP.cpp:286-303
                    # iteration_hook_): a traced predicate on the
                    # post-solver solution (the reference's
                    # IterationHook_Input.currentSolution) — see the
                    # ICPParameters.iteration_hook docstring
                    stop = jnp.asarray(
                        params.iteration_hook(
                            carry.iteration, pose_out.R, pose_out.t,
                            pairings.size(),
                        ),
                        dtype=bool,
                    )
                    reason = jnp.where(
                        (reason == _RUNNING) & stop,
                        jnp.asarray(
                            IterTermReason.HOOK_REQUEST, jnp.int32
                        ),
                        reason,
                    )
                return _LoopCarry(
                    pose=pose_out,
                    prev_pose=carry.pose,
                    iteration=carry.iteration + 1,
                    reason=reason,
                    pairings=pairings,
                    solver_finished=solver_finished,
                )

            return body

        # The first segment's body always executes at least once (init
        # reason=_RUNNING) and recomputes pairings at iteration 0, so the
        # carry only needs a structurally-correct placeholder — zeros, which
        # XLA dead-code eliminates (a real matcher run here wasted
        # ~1.4 ms/align). All-True active flags give the full concatenated
        # block structure shared by every segment.
        segments = self._schedule_segments(params, matchers)
        init_shapes = jax.eval_shape(
            lambda pose, it: self._run_matchers(
                matchers, (True,) * len(matchers), grids, g_layers,
                l_layers, pose, it
            ),
            guess,
            jnp.asarray(0, jnp.int32),
        )
        init_pairings = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), init_shapes
        )
        init = _LoopCarry(
            pose=guess,
            prev_pose=guess,
            iteration=jnp.asarray(0, jnp.int32),
            reason=jnp.asarray(_RUNNING, jnp.int32),
            pairings=init_pairings,
            solver_finished=jnp.zeros((len(self.solvers),), bool),
        )
        iter_poses = None
        iter_counts = None
        iter_pairs = None
        if params.record_iterations:
            # bounded scans: after termination the carry is held frozen, so
            # the recorded tail repeats the final state
            carry = init
            rec_p, rec_c, rec_pr = [], [], []
            for a, b, m_act, s_act in segments:
                body = make_body(m_act, s_act)

                def scan_body(carry, _, body=body, b=b):
                    run = (carry.reason == _RUNNING) & (carry.iteration < b)
                    new_carry = jax.lax.cond(
                        run, lambda c: body(c), lambda c: c, carry
                    )
                    rec = (
                        new_carry.pairings.decimated(
                            params.record_pairings_capacity
                        )
                        if params.record_pairings
                        else 0
                    )
                    return new_carry, (
                        new_carry.pose,
                        new_carry.pairings.size(),
                        rec,
                    )

                carry, (p_seg, c_seg, pr_seg) = jax.lax.scan(
                    scan_body, carry, None, length=b - a
                )
                carry = self._apply_quality_checkpoint(
                    params, carry, b, grids, g_layers, l_layers
                )
                rec_p.append(p_seg)
                rec_c.append(c_seg)
                rec_pr.append(pr_seg)
            final = carry
            iter_poses = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *rec_p
            )
            iter_counts = jnp.concatenate(rec_c, axis=0)
            if params.record_pairings:
                iter_pairs = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *rec_pr
                )
        else:
            # one while_loop per schedule segment; a segment whose entry
            # condition is already false (converged earlier) costs one
            # predicate evaluation
            carry = init
            for a, b, m_act, s_act in segments:
                def cond_seg(carry, b=b):
                    return (carry.reason == _RUNNING) & (carry.iteration < b)

                carry = jax.lax.while_loop(
                    cond_seg, make_body(m_act, s_act), carry
                )
                carry = self._apply_quality_checkpoint(
                    params, carry, b, grids, g_layers, l_layers
                )
            final = carry

        reason = jnp.where(
            final.reason == _RUNNING, IterTermReason.MAX_ITERATIONS, final.reason
        )

        # final quality = sum w_i q_i / sum w_i; hard discard forces 0
        # (reference: ICP.cpp:322-324, 608-634)
        quality = self._quality_stack(
            final.pairings, grids, g_layers, l_layers, final.pose,
            final.iteration,
        )

        cov = compute_covariance(final.pairings, final.pose)

        # optimal scale (reference: Results.h:35-36 optimalScale). Reported
        # only — like the reference, the pose itself stays rigid. Computed
        # once from the FINAL pairings when a Horn solver opted in, so the
        # loop carry needs no extra state.
        opt_scale = jnp.asarray(1.0)
        for s in self.solvers:
            if getattr(s, "estimate_scale", False) and s.enabled:
                from mp2p_icp_tpu.solvers.horn import horn_scale
                from mp2p_icp_tpu.solvers.pt2_conversions import (
                    pt2ln_pl_to_pt2pt,
                )

                opt_scale = horn_scale(
                    pt2ln_pl_to_pt2pt(final.pairings, final.pose),
                    s.weight_params,
                )
                break

        return ICPResults(
            optimal_tf=final.pose,
            optimal_scale=opt_scale,
            n_iterations=final.iteration,
            termination_reason=reason,
            quality=quality,
            final_pairings=final.pairings,
            covariance=cov,
            iteration_poses=iter_poses,
            iteration_pair_counts=iter_counts,
            iteration_pairings=iter_pairs,
        )
