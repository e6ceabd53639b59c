"""Batched nearest-neighbour queries over a HashGrid — DOCUMENTED FALLBACK.

STATUS (VERDICT r3 Next #9): the production NN everywhere in the matchers
is the exact MXU brute-force kernel (``ops.nn_bruteforce.knn_bruteforce``);
this grid-hash path is kept as a bounded-compute FALLBACK for
memory-constrained non-TPU deployments (its candidate set is O(27·k_per_cell)
per query vs the brute-force sweep's O(C)), parity-tested against
``knn_bruteforce`` on decimated clouds in tests/test_nn.py
(TestGridVsBruteforceParity). ``resolve_one_to_one`` below is NOT legacy —
it is the production one-to-one pairing resolver used by
matchers/distance_threshold.py.

TPU-native replacement for the reference's per-point KD-tree queries
(reference: Matcher_Points_DistanceThreshold.cpp:123-205 nn_single_search /
nn_radius_search loops). All queries are fully batched: every local point
gathers a *static* candidate set (27 neighbour cells x K_PER_CELL bucket
slots), computes all squared distances at once, and reduces with min/top_k.
No data-dependent control flow — one fused XLA program.

Completeness: exact within `radius` as long as grid.cell_size >= radius
(then all points within radius lie in the 27-cell neighbourhood) and bucket
occupancy <= K_PER_CELL (overflowing candidates are dropped — the builder
should choose cell_size comparable to the decimation resolution so
occupancy stays small; collisions from the hash add only false candidates).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.ops.voxel_hash import (
    NEIGHBOR_OFFSETS,
    HashGrid,
    cell_coords,
    hash_cells,
)

_BIG = 3.0e37  # (plain float: no jnp at import — see voxel_hash note)


class NNResult(NamedTuple):
    """k-NN result for a batch of queries.
    idx: [Q, k] original-cloud indices (-1 = no neighbour)
    dist_sq: [Q, k] squared distances (BIG where invalid)
    valid: [Q, k] bool"""

    idx: jax.Array
    dist_sq: jax.Array
    valid: jax.Array


def _gather_candidates(grid: HashGrid, queries: jax.Array, k_per_cell: int):
    """LEGACY grid path (production matchers use ops.nn_bruteforce; this
    module survives for the voxel-hash tests). Known limitation: when two
    of the 27 neighbour cells hash-collide into one bucket their candidate
    rows are gathered twice, and the k>1 top_k below has no dedup — a
    duplicated neighbour can occupy two ranks. The exact MXU brute-force
    path has no such artefact.

    Candidate rows for each query: [Q, 27*k_per_cell] sorted-row indices
    + validity mask."""
    H = grid.bucket_start.shape[0]
    qcells = cell_coords(queries, grid.cell_size)  # [Q, 3]
    ncells = qcells[:, None, :] + NEIGHBOR_OFFSETS[None, :, :]  # [Q, 27, 3]
    nh = hash_cells(ncells, H)  # [Q, 27]
    start = grid.bucket_start[nh]  # [Q, 27]
    count = grid.bucket_count[nh]  # [Q, 27]
    slot = jnp.arange(k_per_cell, dtype=jnp.int32)  # [k]
    rows = start[..., None] + slot  # [Q, 27, k]
    cand_valid = slot < count[..., None]  # [Q, 27, k]
    C = grid.points_sorted.shape[0]
    rows = jnp.clip(rows, 0, C - 1)
    Q = queries.shape[0]
    return rows.reshape(Q, -1), cand_valid.reshape(Q, -1)


def nn_search(
    grid: HashGrid,
    queries: jax.Array,
    query_valid: jax.Array,
    k: int = 1,
    k_per_cell: int = 8,
    max_radius_sq: float | jax.Array | None = None,
) -> NNResult:
    """k nearest neighbours of each query point within the 27-cell
    neighbourhood (exact within grid.cell_size).

    queries: [Q, 3]; query_valid: [Q] bool.
    """
    rows, cand_valid = _gather_candidates(grid, queries, k_per_cell)  # [Q, M]
    cand_pts = grid.points_sorted[rows]  # [Q, M, 3]
    d = cand_pts - queries[:, None, :]
    dist_sq = jnp.sum(d * d, axis=-1)  # [Q, M]
    cand_valid = cand_valid & grid.valid_sorted[rows] & query_valid[:, None]
    if max_radius_sq is not None:
        cand_valid = cand_valid & (dist_sq < max_radius_sq)
    dist_sq = jnp.where(cand_valid, dist_sq, _BIG)

    if k == 1:
        best = jnp.argmin(dist_sq, axis=-1)  # [Q]
        bd = jnp.take_along_axis(dist_sq, best[:, None], axis=-1)  # [Q, 1]
        brow = jnp.take_along_axis(rows, best[:, None], axis=-1)
        valid = bd < _BIG
        idx = jnp.where(valid, grid.order[brow], -1)
        return NNResult(idx=idx, dist_sq=bd, valid=valid)

    # top-k smallest distances
    neg = -dist_sq
    topv, topi = jax.lax.top_k(neg, k)  # [Q, k]
    bd = -topv
    brow = jnp.take_along_axis(rows, topi, axis=-1)
    valid = bd < _BIG
    idx = jnp.where(valid, grid.order[brow], -1)
    return NNResult(idx=idx, dist_sq=bd, valid=valid)


def resolve_one_to_one(
    nn_idx: jax.Array,
    nn_dist_sq: jax.Array,
    nn_valid: jax.Array,
    n_global_capacity: int,
) -> jax.Array:
    """Enforce one-to-one local<->global pairing: when several local points
    claim the same global point, only the closest keeps it (ties: lowest
    local index).

    The reference enforces this with order-dependent bitfield marking
    (Matcher_Points_DistanceThreshold.cpp:99-120; racy under TBB). Here it
    is a deterministic lexicographic sort by (global idx, distance, local
    idx) — winners are the segment heads. Sort-based instead of
    scatter/gather-based: small-tensor gathers cost ~1-2 ms on this TPU
    while multi-key sorts run in tens of microseconds. Returns the refined
    valid mask [Q]. k=1 claims only (pairingsPerPoint>1 shares globals in
    the reference too).
    """
    Q = nn_idx.shape[0]
    idx = jnp.where(nn_valid[:, 0], nn_idx[:, 0], jnp.int32(2147483647))
    d = jnp.where(nn_valid[:, 0], nn_dist_sq[:, 0], _BIG)
    rows = jnp.arange(Q, dtype=jnp.int32)
    idx_s, d_s, rows_s = jax.lax.sort((idx, d, rows), num_keys=3)
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]]
    )
    win_sorted = is_head & (idx_s != 2147483647)
    # unsort: one scatter of the win flags back to local order
    return jnp.zeros((Q,), bool).at[rows_s].set(win_sorted)
