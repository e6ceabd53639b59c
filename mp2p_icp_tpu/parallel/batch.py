"""Batched (data-parallel) registration.

Replaces the reference's per-frame CLI scale-out (scripts/kitti-run-seq.py
drives ``icp-run`` once per scan pair) with one vmapped/sharded XLA program:
a whole batch of independent ICP registrations runs as a single fused
computation; placed on a Mesh, XLA SPMD splits the batch across devices over
the 'data' axis with zero code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import numpy as np

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.ops.voxel_hash import HashGrid


def _grid_axes(grid: HashGrid) -> HashGrid:
    """in_axes tree for a batched HashGrid: arrays on axis 0, the static
    cell size unbatched."""
    return HashGrid(
        points_sorted=0, order=0, valid_sorted=0,
        bucket_start=0, bucket_count=0, cell_size=None,
    )


def make_batched_align(icp: ICP, params: ICPParameters, grids_template: Dict[str, HashGrid]):
    """Returns a jitted function
        (batched_grids, batched_g_layers, batched_l_layers, batched_guess)
        -> batched ICPResults
    where every array input carries a leading batch axis. Matcher configs
    (k_per_cell etc.) are frozen from ``grids_template``.
    """
    matchers = icp._effective_matchers(grids_template)

    def single(grids, g_layers, l_layers, guess):
        return icp._align_core(params, matchers, grids, g_layers, l_layers, guess, None)

    grid_axes = {name: _grid_axes(g) for name, g in grids_template.items()}
    in_axes = (grid_axes, 0, 0, 0)
    return jax.jit(jax.vmap(single, in_axes=in_axes))


def stack_pytrees(trees):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *trees)


def batch_grids(icp: ICP, batched_global_layers: Dict[str, PointCloud]):
    """Build per-pair hash grids for a batch of global maps: vmapped build.
    batched_global_layers: dict of PointCloud whose arrays have leading B."""
    sizes = icp._grid_cell_sizes()
    out = {}
    for name, size in sizes.items():
        layer = batched_global_layers[name]

        def build_one(xyz, count, size=size):
            pc = PointCloud(xyz=xyz, count=count)
            from mp2p_icp_tpu.ops.voxel_hash import build_hash_grid

            return build_hash_grid(xyz, pc.valid_mask(), cell_size=size)

        out[name] = jax.vmap(build_one, out_axes=_grid_axes(None))(
            layer.xyz, layer.count
        )
    return out
