"""Incremental voxel hash map — O(n_new) per-frame map maintenance.

The reference's map-update path re-inserts each keyframe into a spatial
hash (mp2p_icp_filters/include/mp2p_icp_filters/PointCloudToVoxelGrid.h:
88-116, Teschner constants 73856093/19349663/83492791) and its NN map
rebuilds a KD-tree lazily per frame (metricmap.cpp:784-802). The r4 TPU
port of that pattern ran a full map-capacity lexicographic SORT every
frame (FilterMerge + FilterDecimateVoxels FIRST_POINT), which dominated
the odometry per-frame cost (BASELINE.md r4: sorts over map CAPACITY,
not live points).

This module replaces the per-frame sort with an INCREMENTAL open-address
hash table kept on device next to the point buffer:

- state  = fixed-capacity point buffer (unique voxel representatives, in
  insertion order — the reference's FirstPoint winner is the earliest
  inserted point, which this reproduces exactly) + two [T] key tables
  (exact 45-bit voxel key split into two int32 words: no hash-collision
  aliasing, same packing as ops/voxel_unique.py).
- insert = lockstep parallel linear probing: each round, every still-
  pending point gathers its probe slot; key-match resolves as duplicate,
  empty slots are claimed by scatter-min of the point index, winners
  scatter their key and append to the buffer. All points with the same
  key share the same probe sequence and rounds are lockstep, so the
  linear-probing invariant (a key lives at the first empty slot of its
  probe sequence at insert time; no deletions) holds and lookups are
  exact.

Cost per frame: max_probe gather/scatter rounds over [N_new] —
independent of map capacity. The sort-based path's cost was
O(C log^2 C) bitonic work over the whole buffer every frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud

_OFFSET = 1 << 14  # identical cell packing to ops/voxel_unique.py
_SENTINEL = 2147483647
_HX = 73856093
_HY = 19349663
_HZ = 83492791


class VoxelHashMapState(NamedTuple):
    """Rolling voxel-unique map: point buffer + exact-key hash table.

    pc:        PointCloud — one representative point per occupied voxel,
               in insertion order (FirstPoint semantics).
    table_k1:  [T] int32 — key word 1 per slot (_SENTINEL = empty).
    table_k2:  [T] int32 — key word 2 per slot.
    n_dropped: scalar int32 — points that won a voxel but overflowed the
               buffer (capacity-sizing diagnostic; the voxel stays open).
    """

    pc: PointCloud
    table_k1: jax.Array
    table_k2: jax.Array
    n_dropped: jax.Array


def table_size_for(capacity: int) -> int:
    """Power-of-two table >= 4x capacity (load factor <= 0.25 keeps the
    expected probe chain ~1.2 slots)."""
    ts = 1024
    while ts < 4 * capacity:
        ts *= 2
    return ts


def empty_voxel_hash_map(
    capacity: int,
    table_size: Optional[int] = None,
    intensity: bool = False,
    ring: bool = False,
    time: bool = False,
    normals: bool = False,
) -> VoxelHashMapState:
    T = table_size or table_size_for(capacity)

    def zeros(on):
        return jnp.zeros((capacity,), jnp.float32) if on else None

    pc = PointCloud(
        xyz=jnp.full((capacity, 3), PointCloud.PAD_VALUE, jnp.float32),
        count=jnp.asarray(0, jnp.int32),
        intensity=zeros(intensity),
        ring=zeros(ring),
        time=zeros(time),
        normals=(
            jnp.zeros((capacity, 3), jnp.float32) if normals else None
        ),
    )
    return VoxelHashMapState(
        pc=pc,
        table_k1=jnp.full((T,), _SENTINEL, jnp.int32),
        table_k2=jnp.full((T,), _SENTINEL, jnp.int32),
        n_dropped=jnp.asarray(0, jnp.int32),
    )


def voxel_keys(xyz: jax.Array, valid: jax.Array, resolution):
    """Exact two-word voxel key (same cell math as ops/voxel_unique.py);
    invalid rows get (_SENTINEL, _SENTINEL). Also returns the Teschner
    hash of the cell (callers mask it to the table size)."""
    cells = jnp.floor(xyz / resolution).astype(jnp.int32) + _OFFSET
    cells = jnp.clip(cells, 0, 2 * _OFFSET - 1)
    k1 = cells[:, 0] * (1 << 15) + cells[:, 1]
    k2 = cells[:, 2]
    k1 = jnp.where(valid, k1, _SENTINEL)
    k2 = jnp.where(valid, k2, _SENTINEL)
    h = (cells[:, 0] * _HX) ^ (cells[:, 1] * _HY) ^ (cells[:, 2] * _HZ)
    # murmur3 finalizer: the raw Teschner XOR clusters badly on the
    # thin-shell cell sets real LiDAR sweeps produce (measured: max linear-
    # probe chain 11 at 8% load without it, ~3 with it), and linear
    # probing amplifies any clustering into spurious chain exhaustion
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = (h ^ (h >> 16)).astype(jnp.int32)
    return k1, k2, h


def hash_map_insert(
    state: VoxelHashMapState,
    new: PointCloud,
    resolution,
    valid: Optional[jax.Array] = None,
    max_probe: int = 12,
    with_dest: bool = False,
) -> VoxelHashMapState:
    """Insert `new`'s valid points; a point lands in the buffer iff its
    voxel is unoccupied (FirstPoint, insertion order — earlier buffer
    rows, then lower input index, win). Fully traced, static shapes.

    valid: optional explicit mask (default: new.valid_mask(), i.e.
    leading-rows validity).
    with_dest: also return the [N] i32 buffer row each input point landed
    in (C = not inserted) — lets callers post-process just the winners
    (e.g. fit normals only for newly inserted map points)."""
    T = state.table_k1.shape[0]
    C = state.pc.capacity
    N = new.capacity
    smask = T - 1
    if valid is None:
        valid = new.valid_mask()

    k1, k2, h = voxel_keys(new.xyz, valid, resolution)
    slot0 = h & smask
    idx = jnp.arange(N, dtype=jnp.int32)

    # Per-point probe POINTER: a point advances past a slot only when it
    # holds a DIFFERENT key; a claim loser re-examines the same slot next
    # round (it may now hold this point's own key -> duplicate). Rounds
    # run until every point resolves; `max_probe` bounds the per-point
    # chain length, the round count is bounded by chain + contention and
    # the loop exits as soon as nothing is pending (typically 2-3 rounds).
    def cond(carry):
        _tk1, _tk2, pending, _probe, _ws, _ex, rounds = carry
        return jnp.any(pending) & (rounds < 4 * max_probe)

    def body(carry):
        tk1, tk2, pending, probe, win_slot, exhausted_n, rounds = carry
        slot = (slot0 + probe) & smask
        g1 = tk1[slot]
        g2 = tk2[slot]
        is_dup = pending & (g1 == k1) & (g2 == k2)
        is_empty = pending & (g1 == _SENTINEL)
        occupied_other = pending & ~is_dup & ~is_empty
        # claim empty slots: lowest pending point index wins this round
        claim = (
            jnp.full((T,), N, jnp.int32)
            .at[jnp.where(is_empty, slot, T)]
            .min(jnp.where(is_empty, idx, N), mode="drop")
        )
        winner = is_empty & (claim[slot] == idx)
        wslot = jnp.where(winner, slot, T)
        tk1 = (
            jnp.concatenate([tk1, jnp.full((1,), _SENTINEL, jnp.int32)])
            .at[wslot].set(jnp.where(winner, k1, _SENTINEL))[:T]
        )
        tk2 = (
            jnp.concatenate([tk2, jnp.full((1,), _SENTINEL, jnp.int32)])
            .at[wslot].set(jnp.where(winner, k2, _SENTINEL))[:T]
        )
        win_slot = jnp.where(winner, slot, win_slot)
        pending = pending & ~is_dup & ~winner
        probe = probe + occupied_other.astype(jnp.int32)
        # chain exhausted: drop (pathological table fill)
        exhausted = pending & (probe >= max_probe)
        pending = pending & ~exhausted
        exhausted_n = exhausted_n + jnp.sum(exhausted.astype(jnp.int32))
        return (tk1, tk2, pending, probe, win_slot, exhausted_n,
                rounds + 1)

    init = (
        state.table_k1,
        state.table_k2,
        valid,
        jnp.zeros((N,), jnp.int32),
        jnp.full((N,), T, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    (tk1, tk2, pending, _probe, win_slot, exhausted_n,
     _rounds) = jax.lax.while_loop(cond, body, init)
    # unresolved after the round bound (cannot happen: every round resolves
    # at least one point) counts as dropped, like chain exhaustion
    exhausted_n = exhausted_n + jnp.sum(pending.astype(jnp.int32))

    # assign buffer rows AFTER the probe loop, in INPUT order — winners
    # delayed by collision chains still land in insertion order, exactly
    # matching the reference's FirstPoint scan order
    winner = win_slot < T
    rank = jnp.cumsum(winner.astype(jnp.int32)) - 1
    dest = state.pc.count + rank
    keep = winner & (dest < C)
    # buffer overflow rolls the table write back: the voxel stays open
    # for a later frame with free space
    rb_slot = jnp.where(winner & ~keep, win_slot, T)
    tk1 = (
        jnp.concatenate([tk1, jnp.full((1,), _SENTINEL, jnp.int32)])
        .at[rb_slot].set(_SENTINEL)[:T]
    )
    tk2 = (
        jnp.concatenate([tk2, jnp.full((1,), _SENTINEL, jnp.int32)])
        .at[rb_slot].set(_SENTINEL)[:T]
    )
    dest = jnp.where(keep, dest, C)
    count = state.pc.count + jnp.sum(keep.astype(jnp.int32))
    dropped = (
        state.n_dropped
        + exhausted_n
        + jnp.sum((winner & ~keep).astype(jnp.int32))
    )

    pc = state.pc
    new_xyz = (
        jnp.concatenate([pc.xyz, jnp.zeros((1, 3), pc.xyz.dtype)])
        .at[dest]
        .set(new.xyz)[:C]
    )

    def merge_ch(t_ch, s_ch):
        if t_ch is None and s_ch is None:
            return None
        t = t_ch if t_ch is not None else jnp.zeros((C,), jnp.float32)
        s = s_ch if s_ch is not None else jnp.zeros((N,), jnp.float32)
        return (
            jnp.concatenate([t, jnp.zeros((1,), t.dtype)])
            .at[dest]
            .set(s)[:C]
        )

    def merge_ch3(t_ch, s_ch):
        if t_ch is None and s_ch is None:
            return None
        t = t_ch if t_ch is not None else jnp.zeros((C, 3), jnp.float32)
        s = s_ch if s_ch is not None else jnp.zeros((N, 3), jnp.float32)
        return (
            jnp.concatenate([t, jnp.zeros((1, 3), t.dtype)])
            .at[dest]
            .set(s)[:C]
        )

    new_pc = PointCloud(
        xyz=new_xyz,
        count=count,
        intensity=merge_ch(pc.intensity, new.intensity),
        ring=merge_ch(pc.ring, new.ring),
        time=merge_ch(pc.time, new.time),
        normals=merge_ch3(pc.normals, new.normals),
    )
    out = VoxelHashMapState(
        pc=new_pc, table_k1=tk1, table_k2=tk2, n_dropped=dropped
    )
    if with_dest:
        return out, dest
    return out


def hash_decimate_first_point(
    new: PointCloud,
    resolution,
    output_capacity: int,
    valid: Optional[jax.Array] = None,
    table_size: Optional[int] = None,
    max_probe: int = 12,
) -> PointCloud:
    """One-shot FirstPoint voxel decimation via a scratch hash table —
    the sort-free fast path behind FilterDecimateVoxels(backend='hash').
    Winner per voxel = lowest input index (the reference's insertion-order
    FirstPoint, FilterDecimateVoxels.cpp:244-270); output rows keep the
    winners' input order. Channels ride along."""
    state = empty_voxel_hash_map(
        output_capacity,
        table_size=table_size,
        intensity=new.intensity is not None,
        ring=new.ring is not None,
        time=new.time is not None,
        normals=new.normals is not None,
    )
    return hash_map_insert(
        state, new, resolution, valid=valid, max_probe=max_probe
    ).pc
