"""Spatial grid-hash construction — the TPU-native replacement for KD-trees.

The reference's primary NN structure is a nanoflann KD-tree hidden behind
``NearestNeighborsCapable`` (reference: Matcher_Points_Base.cpp:104-114,
metricmap.cpp:784-802); its voxel decimation uses a Teschner spatial hash
(reference: mp2p_icp_filters/include/mp2p_icp_filters/PointCloudToVoxelGrid.h:88-116,
hash constants 73856093 / 19349663 / 83492791).

KD-trees are pointer-chasing and branchy — hostile to TPU. A voxel grid
hash is the TPU-friendly dual: build = hash + sort + searchsorted (all XLA
primitives with O(N log N) work and perfect vectorisation), query =
gather-and-reduce over a static candidate set (see ops/nn.py).

Design notes:
- Hash table size is a static power of two; collisions merely add false
  candidates that the distance test filters (correctness preserved because
  equal cells always hash equally — no false negatives).
- Padding points (sentinel coords) hash to arbitrary buckets but carry an
  invalid flag and are masked in queries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Teschner et al. optimised spatial hash constants (same as the reference).
_HX = 73856093
_HY = 19349663
_HZ = 83492791


class HashGrid(NamedTuple):
    """Sorted spatial hash index over a fixed-capacity point set.

    points_sorted: [C, 3] points reordered by bucket hash
    order:         [C] original index of each sorted row
    valid_sorted:  [C] validity of each sorted row
    bucket_start:  [H] first sorted row of each hash bucket
    bucket_count:  [H] number of rows in each bucket
    cell_size:     static float — metres per cell (must be >= query radius
                   for 27-cell completeness)
    """

    points_sorted: jax.Array
    order: jax.Array
    valid_sorted: jax.Array
    bucket_start: jax.Array
    bucket_count: jax.Array
    cell_size: float


def cell_coords(points: jax.Array, cell_size) -> jax.Array:
    return jnp.floor(points / cell_size).astype(jnp.int32)


def hash_cells(cells: jax.Array, table_size: int) -> jax.Array:
    """Teschner hash of integer cell coords into [0, table_size)."""
    h = (cells[..., 0] * _HX) ^ (cells[..., 1] * _HY) ^ (cells[..., 2] * _HZ)
    return h & (table_size - 1)


def _table_size_for(capacity: int) -> int:
    # ~2x points for low collision rate, power of two, min 1024
    ts = 1024
    while ts < 2 * capacity:
        ts *= 2
    return ts


def build_hash_grid(
    points: jax.Array,
    valid: jax.Array,
    cell_size: float,
    table_size: int | None = None,
) -> HashGrid:
    """Build the sorted hash index. All static shapes: [C] points in, [C]
    sorted rows + [H] bucket table out."""
    C = points.shape[0]
    H = table_size or _table_size_for(C)
    cells = cell_coords(points, cell_size)
    h = hash_cells(cells, H)
    # push invalid points to one past the last bucket so they never match
    h = jnp.where(valid, h, H)
    order = jnp.argsort(h)
    h_sorted = h[order]
    points_sorted = points[order]
    valid_sorted = h_sorted < H
    # bucket ranges via binary search over the sorted hash codes
    buckets = jnp.arange(H, dtype=h_sorted.dtype)
    bucket_start = jnp.searchsorted(h_sorted, buckets, side="left").astype(jnp.int32)
    bucket_end = jnp.searchsorted(h_sorted, buckets, side="right").astype(jnp.int32)
    return HashGrid(
        points_sorted=points_sorted,
        order=order.astype(jnp.int32),
        valid_sorted=valid_sorted,
        bucket_start=bucket_start,
        bucket_count=bucket_end - bucket_start,
        cell_size=float(cell_size),
    )


# The 27 neighbour offsets of a 3x3x3 cell neighbourhood, static constant.
# numpy on purpose: a module-level jnp array would initialise the XLA
# backend at import time, breaking jax.distributed.initialize() (which
# must run first in multi-process mode — parallel/multihost.py)
import numpy as _np

NEIGHBOR_OFFSETS = _np.stack(
    _np.meshgrid(
        _np.arange(-1, 2), _np.arange(-1, 2), _np.arange(-1, 2), indexing="ij"
    ),
    axis=-1,
).reshape(27, 3)
