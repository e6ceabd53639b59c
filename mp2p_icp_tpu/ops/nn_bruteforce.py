"""Brute-force (exact) nearest-neighbour search on the MXU.

THE core TPU insight of this framework: the reference's KD-tree queries
(nanoflann behind NearestNeighborsCapable) are pointer-chasing — hostile to
TPU — and XLA's row-gather lowering makes hash-grid candidate gathering
~1000x off speed-of-light (measured 25 ms for 8k queries x 27x8
candidates). The MXU turns exact all-pairs distances into a matmul:

    d^2(q, p) = |q|^2 + |p|^2 - 2 q.p

For Q = C = 8192 that is 0.4 GFLOP — microseconds on the MXU — plus a
running min over point tiles held in VMEM (flash-attention-style streaming,
never materialising the Q x C matrix). Exact, radius-free, no data
structure to build or tune.

Layout: coordinates are passed TRANSPOSED ([3, N]) so the lane (last) dim
is the 128-aligned point axis; the contraction dim is 3.

k > 1 is k sequential passes of the k=1 kernel with per-query exclusion
lists — k is small (<= 8) everywhere in the framework.

A pure-XLA fallback (chunked lax.map) covers CPU tests and any
non-TPU backend.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e37)


class NNResult(NamedTuple):
    idx: jax.Array  # [Q, k] i32 (-1 invalid)
    dist_sq: jax.Array  # [Q, k] f32 (BIG invalid)
    valid: jax.Array  # [Q, k] bool


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# --------------------------------------------------------------- Pallas TPU
def _nn1_kernel(q_ref, p_ref, pn_ref, excl_ref, bestd_ref, besti_ref, E):
    """One (point-tile, query-tile) step: update running min/argmin.

    q_ref:  [3, TQ] query tile (fixed per grid row)
    p_ref:  [3, TC] point tile (streamed)
    pn_ref: [1, TC] point squared norms
    excl_ref: [E, TQ] excluded global point ids per query (or E=0)
    bestd/besti: [1, TQ] running best (accumulated across point tiles)
    """
    BIG = 3.0e37  # plain python float: kernels must not capture arrays
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        bestd_ref[...] = jnp.full_like(bestd_ref, BIG)
        besti_ref[...] = jnp.full_like(besti_ref, -1)

    q = q_ref[...]  # [3, TQ]
    p = p_ref[...]  # [3, TC]
    # [TC, TQ] = p^T q  (contraction over the coordinate axis)
    pq = jax.lax.dot_general(
        p, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = pn_ref[...].reshape(-1, 1) - 2.0 * pq  # |p|^2 - 2 p.q  ([TC, TQ])
    # (|q|^2 omitted: constant per query — does not change the argmin;
    #  added back by the caller when true distances are needed)

    TC = d2.shape[0]
    row_global = (
        i * TC + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    )  # [TC, TQ]

    if E:
        excl = excl_ref[...]  # [E, TQ]
        for e in range(E):
            d2 = jnp.where(row_global == excl[e][None, :], BIG, d2)

    tile_best = jnp.min(d2, axis=0)  # [TQ]
    tile_arg = jnp.argmin(d2, axis=0).astype(jnp.int32)  # [TQ]
    tile_idx = i * TC + tile_arg

    cur_d = bestd_ref[0, :]
    take = tile_best < cur_d
    bestd_ref[0, :] = jnp.where(take, tile_best, cur_d)
    besti_ref[0, :] = jnp.where(take, tile_idx, besti_ref[0, :])


try:  # import guard so CPU-only environments can still import the module
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@functools.partial(jax.jit, static_argnames=("tq", "tc", "interpret"))
def _nn1_pallas(qT, pT, pn, excl, tq=256, tc=512, interpret=False):
    """k=1 pass. qT: [3, Qp], pT: [3, Cp], pn: [1, Cp], excl: [E, Qp].
    Returns (partial_d [Qp] = |p|^2 - 2 q.p at best, idx [Qp])."""
    Qp = qT.shape[1]
    Cp = pT.shape[1]
    E = excl.shape[0]
    grid = (Qp // tq, Cp // tc)
    kernel = functools.partial(_nn1_kernel, E=E)
    bestd, besti = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tq), lambda j, i: (0, j)),
            pl.BlockSpec((3, tc), lambda j, i: (0, i)),
            pl.BlockSpec((1, tc), lambda j, i: (0, i)),
            pl.BlockSpec((max(E, 1), tq), lambda j, i: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda j, i: (0, j)),
            pl.BlockSpec((1, tq), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(qT, pT, pn, excl if E else jnp.full((1, Qp), -1, jnp.int32))
    return bestd[0], besti[0]


# ----------------------------------------------------------------- XLA path
def _nn_xla_topk(q_rows, p_rows, k, chunk=2048):
    """All k neighbours in ONE pass per query chunk: the [chunk, Cp]
    distance tile feeds a single lax.top_k, which returns values AND
    indices in one reduction.

    LAYOUT MATTERS on this TPU: standalone ops on [N, 3]-shaped tensors
    (transposes, wheres, gathers) cost 1-2 ms each because the minor dim 3
    wastes 125/128 lanes; everything here is written so those small-tensor
    ops fuse into the distance matmul (row-major einsum, no transposes).

    q_rows: [Qp, 3]; p_rows: [Cp, 3] (invalid entries at far sentinel).
    Returns (partial_d [Qp, k] = |p|^2 - 2 q.p, idx [Qp, k])."""
    Qp = q_rows.shape[0]
    chunk = min(chunk, Qp)
    pn = jnp.sum(p_rows * p_rows, axis=1)  # [Cp]

    def one_chunk(q_chunk):  # [chunk, 3]
        pq = jnp.einsum("qc,kc->qk", q_chunk, p_rows)  # [chunk, Cp]
        d2 = pn[None, :] - 2.0 * pq
        if k == 1:
            # k=1: fused min+argmin reduce — 3x faster than lax.top_k on
            # this TPU (0.7 ms vs 2.2 ms for 8k x 8k; measured)
            ds = jnp.min(d2, axis=1, keepdims=True)
            idx = jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
            return ds, idx
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx.astype(jnp.int32)

    if Qp == chunk:
        ds, idxs = one_chunk(q_rows)
        return ds, idxs
    qs = q_rows.reshape(Qp // chunk, chunk, 3)
    ds, idxs = jax.lax.map(one_chunk, qs)
    return ds.reshape(Qp, k), idxs.reshape(Qp, k)


# ------------------------------------------------------------------ public
def knn_bruteforce(
    queries: jax.Array,
    query_valid: jax.Array,
    points: jax.Array,
    point_valid: jax.Array,
    k: int = 1,
    max_radius_sq: Optional[jax.Array] = None,
    backend: str = "auto",
    interpret: bool = False,
) -> NNResult:
    """Exact kNN of queries [Q, 3] among points [C, 3].

    max_radius_sq: scalar or [Q] — pairs beyond it are invalidated.
    backend: 'auto' | 'pallas' | 'xla'.
    """
    Q, C = queries.shape[0], points.shape[0]
    if backend == "auto":
        # The XLA path (chunked MXU matmul + fused min) is the default: on
        # this image the Pallas remote-compile service hangs and local AOT
        # hits a libtpu version mismatch. Set MP2P_NN_BACKEND=pallas once a
        # working Mosaic toolchain is available — the kernel itself is
        # tested (interpret mode) and ready.
        import os

        backend = os.environ.get("MP2P_NN_BACKEND", "xla")
        if backend == "pallas" and not (
            _HAS_PALLAS and jax.default_backend() == "tpu"
        ):
            backend = "xla"

    # pad row counts only; invalid entries get a huge coordinate -> never
    # nearest. All masking folds into the distance matmul (see _nn_xla_topk
    # layout note) — no standalone transposes/gathers on [N, 3] tensors.
    # OPPOSITE-SIGN sentinels: an invalid query (+1e8) and an invalid point
    # (-1e8) must not match each other at distance ~0.
    far = jnp.float32(1.0e8)
    q = jnp.where(query_valid[:, None], queries, far)
    p = jnp.where(point_valid[:, None], points, -far)
    qn = jnp.sum(q * q, axis=1)  # [Q] |q|^2 (sentinel-large for invalid)

    if backend == "pallas":
        tq, tc = 256, 512
        Qp = _round_up(Q, tq)
        Cp = _round_up(C, 512)
        qT = jnp.concatenate(
            [q.T, jnp.full((3, Qp - Q), far, jnp.float32)], axis=1
        )
        pT = jnp.concatenate(
            [p.T, jnp.full((3, Cp - C), -far, jnp.float32)], axis=1
        )
        pn = jnp.sum(pT * pT, axis=0, keepdims=True)  # [1, Cp]
        # k sequential passes with per-query exclusion lists
        idxs, dists = [], []
        excl = jnp.full((0, Qp), -1, jnp.int32)
        for _ in range(k):
            pd, pi = _nn1_pallas(
                qT, pT, pn, excl, tq=tq, tc=tc, interpret=interpret
            )
            idxs.append(pi)
            dists.append(pd)
            excl = jnp.concatenate([excl, pi[None, :]], axis=0)
        idx = jnp.stack(idxs, axis=1)[:Q]  # [Q, k]
        pdist = jnp.stack(dists, axis=1)[:Q]
    else:
        Qp = _round_up(Q, 512)
        if Qp != Q:
            q = jnp.concatenate(
                [q, jnp.full((Qp - Q, 3), far, jnp.float32)], axis=0
            )
        pdist, idx = _nn_xla_topk(q, p, k)
        pdist, idx = pdist[:Q], idx[:Q]
    # add back |q|^2 to get true squared distances; clamp tiny negatives
    d2 = jnp.maximum(pdist + qn[:, None], 0.0)

    # validity WITHOUT a point_valid gather: invalid/padded points sit at
    # the far sentinel, so any pair involving one has d2 >~ 1e15 — one
    # distance test covers query validity, point validity and padding
    valid = (idx >= 0) & (idx < C) & (d2 < 1.0e15)
    if max_radius_sq is not None:
        r = jnp.asarray(max_radius_sq)
        r = r[:, None] if r.ndim == 1 else r
        valid = valid & (d2 < r)
    d2 = jnp.where(valid, d2, _BIG)
    idx = jnp.where(valid, idx, -1)
    return NNResult(idx=idx, dist_sq=d2, valid=valid)
