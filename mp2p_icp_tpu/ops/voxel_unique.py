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
