"""Voxel segmentation of a point cloud by lexicographic cell sort.

The static-shape primitive behind all voxel decimation filters
(reference: PointCloudToVoxelGrid[Single], mp2p_icp_filters/include/
mp2p_icp_filters/PointCloudToVoxelGrid.h:35-136 — a robin_map spatial hash).

TPU-first: instead of a hash map, sort points by packed integer cell keys
(multi-key ``lax.sort`` — exact, no hash collisions), find segment
boundaries, and reduce per segment with ``jax.ops.segment_*``. Everything is
fixed capacity: invalid points sort last with a sentinel key.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_OFFSET = 1 << 14  # cells in [-16384, 16383] per axis (15-bit packing
# keeps k1 = (c0 << 15) | c1 < 2^30 — int32-safe, sentinel unambiguous)
_SENTINEL = 2147483647  # i32 max (plain int: no jnp at import — see voxel_hash note)


class VoxelSegments(NamedTuple):
    """Sorted-by-voxel view of a point set.
    order:      [C] original index of each sorted row
    segment_id: [C] voxel segment of each sorted row (invalid rows get
                id = C-1-ish tail segments but are masked)
    valid:      [C] sorted-row validity
    n_voxels:   scalar i32 — number of distinct occupied voxels
    first_in_segment: [C] bool — True at each segment start (valid rows)"""

    order: jax.Array
    segment_id: jax.Array
    valid: jax.Array
    n_voxels: jax.Array
    first_in_segment: jax.Array


def _voxel_keys(xyz, valid, voxel_size, flatten_z):
    cells = jnp.floor(xyz / voxel_size).astype(jnp.int32) + _OFFSET
    cells = jnp.clip(cells, 0, 2 * _OFFSET - 1)
    if flatten_z:
        cells = cells.at[:, 2].set(0)
    k1 = cells[:, 0] * (1 << 15) + cells[:, 1]
    k2 = cells[:, 2]
    k1 = jnp.where(valid, k1, _SENTINEL)
    k2 = jnp.where(valid, k2, _SENTINEL)
    return k1, k2


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _make_first_point_select(flatten_z: bool, out_cap: int):
    """FIRST_POINT winner selection via ONE stable sort + ONE compaction
    scatter: ``lax.sort`` is STABLE, so within a voxel segment rows keep
    original-index order and the first row of each segment IS the lowest-
    index (FirstPoint) winner — no segment_min needed. Winner rows scatter
    their original index straight to their voxel rank (seg_id) slot.

    Why the custom_vmap rule matters: XLA's BATCHED scatter/segment
    lowering is catastrophic on TPU (measured 26 ms for a vmapped B=4 64k
    decimate vs ~2.5 ms sequential), which sank the batched odometry mode
    (BENCH_r04 44 vs 66 scans/s). The rule flattens the batch into ONE
    sort with a leading lane key and ONE flat 1-D scatter.

    Returns (sel [out_cap] i32, n_voxels): sel[j] = original index of
    voxel rank j's winner for j < min(n, out_cap), C beyond."""

    @jax.custom_batching.custom_vmap
    def first_point_select(xyz, valid, voxel_size):
        C = xyz.shape[0]
        k1, k2 = _voxel_keys(xyz, valid, voxel_size, flatten_z)
        idx = jnp.arange(C, dtype=jnp.int32)
        k1s, k2s, order = jax.lax.sort((k1, k2, idx), num_keys=2)
        valid_sorted = k1s != _SENTINEL
        new_seg = (
            jnp.concatenate(
                [jnp.ones((1,), bool),
                 (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
            )
            & valid_sorted
        )
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        n = jnp.sum(new_seg.astype(jnp.int32))
        dest = jnp.where(new_seg & (seg_id < out_cap), seg_id, out_cap)
        sel = (
            jnp.full((out_cap + 1,), C, jnp.int32)
            .at[dest]
            .set(order, mode="drop")[:out_cap]
        )
        return sel, n

    @first_point_select.def_vmap
    def _rule(axis_size, in_batched, xyz, valid, voxel_size):
        B = axis_size

        def bcast(x, batched):
            return (
                x if batched
                else jnp.broadcast_to(x[None], (B,) + jnp.shape(x))
            )

        xyz = bcast(xyz, in_batched[0])
        valid = bcast(valid, in_batched[1])
        C = xyz.shape[1]
        if in_batched[2]:
            # per-lane resolution: scale each lane by its own value before
            # the shared cell computation
            vs_pp = jnp.reshape(voxel_size, (B, 1, 1))
            scaled = (xyz / vs_pp).reshape(B * C, 3)
            k1, k2 = _voxel_keys(
                scaled, valid.reshape(B * C), 1.0, flatten_z
            )
        else:
            k1, k2 = _voxel_keys(
                xyz.reshape(B * C, 3), valid.reshape(B * C),
                voxel_size, flatten_z,
            )
        # ONE flat stable sort with the lane as leading key
        lane = jnp.repeat(
            jnp.arange(B, dtype=jnp.int32), C, total_repeat_length=B * C
        )
        idx = jnp.tile(jnp.arange(C, dtype=jnp.int32), B)
        _l, k1s, k2s, order = jax.lax.sort(
            (lane, k1, k2, idx), num_keys=3
        )
        valid_sorted = k1s != _SENTINEL
        new_seg = (
            jnp.concatenate(
                [jnp.ones((1,), bool),
                 (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
                 | (_l[1:] != _l[:-1])]
            )
            & valid_sorted
        )
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        n_b = jnp.sum(new_seg.reshape(B, C).astype(jnp.int32), axis=1)
        seg_start = jnp.cumsum(n_b) - n_b  # exclusive prefix
        rank = seg_id - seg_start[_l]  # per-lane voxel rank of each row
        # ONE flat 1-D scatter into [B * out_cap]
        dest = jnp.where(
            new_seg & (rank < out_cap),
            _l * out_cap + rank,
            B * out_cap,
        )
        sel = (
            jnp.full((B * out_cap + 1,), C, jnp.int32)
            .at[dest]
            .set(order, mode="drop")[: B * out_cap]
            .reshape(B, out_cap)
        )
        return (sel, n_b), (True, True)

    return first_point_select


def first_point_select(xyz, valid, voxel_size, out_cap: int,
                       flatten_z: bool = False):
    """FirstPoint voxel winners, single-scatter and vmap-safe (see
    _make_first_point_select)."""
    return _make_first_point_select(bool(flatten_z), int(out_cap))(
        xyz, valid, voxel_size
    )


def voxel_segments(
    xyz: jax.Array, valid: jax.Array, voxel_size, flatten_z: bool = False
) -> VoxelSegments:
    C = xyz.shape[0]
    cells = jnp.floor(xyz / voxel_size).astype(jnp.int32) + _OFFSET
    cells = jnp.clip(cells, 0, 2 * _OFFSET - 1)
    if flatten_z:
        cells = cells.at[:, 2].set(0)
    k1 = cells[:, 0] * (1 << 15) + cells[:, 1]
    k2 = cells[:, 2]
    k1 = jnp.where(valid, k1, _SENTINEL)
    k2 = jnp.where(valid, k2, _SENTINEL)
    idx = jnp.arange(C, dtype=jnp.int32)
    k1s, k2s, order = jax.lax.sort((k1, k2, idx), num_keys=2)
    valid_sorted = k1s != _SENTINEL
    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1]),
        ]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    n_voxels = jnp.sum((new_seg & valid_sorted).astype(jnp.int32))
    return VoxelSegments(
        order=order,
        segment_id=seg_id,
        valid=valid_sorted,
        n_voxels=n_voxels,
        first_in_segment=new_seg & valid_sorted,
    )
