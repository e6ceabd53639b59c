"""Voxel-occupancy quality evaluator.

Reference parity: mp2p_icp/src/QualityEvaluator_Voxels.cpp:40-170 — iterate
local & global voxel grids, transform local cell centres into the global
grid, accumulate an agreement loss over (localOcc, globalOcc) pairs and map
it through a sigmoid to [0, 1].

TPU-first: both grids are VoxelGridLayer tensors; the cross-lookup is one
batched hash probe; the loss reduction is a masked sum. The reference's
fitted quadratic agreement surface is reproduced by its sign structure:
matching occupancy states score positive, conflicting states negative.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import VoxelGridLayer
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.quality.paired_ratio import QualityResult


@dataclasses.dataclass(frozen=True)
class QualityVoxels:
    """Params (reference: QualityEvaluator_Voxels.h)."""

    local_layer: str = "localmap_voxels"
    global_layer: str = "globalmap_voxels"
    dist_threshold: float = 0.2  # sigmoid scale
    weight: float = 1.0

    def evaluate_voxels(
        self, local: VoxelGridLayer, globl: VoxelGridLayer, pose: Pose
    ) -> QualityResult:
        centers = se3.apply(pose, local.centers())
        gkeys = jnp.floor(centers / globl.resolution).astype(jnp.int32)
        # linear probe of the global voxel record (capacity C is modest)
        eq = jnp.all(
            gkeys[:, None, :] == globl.keys[None, :, :], axis=-1
        ) & globl.valid[None, :]
        found = jnp.any(eq, axis=1)
        gocc = jnp.where(
            found,
            jnp.einsum("lc,c->l", eq.astype(jnp.float32), globl.occupancy),
            0.5,
        )
        locc = local.occupancy
        both = local.valid & found
        # agreement: product of signed occupancies in [-1, 1]
        a = (2.0 * locc - 1.0) * (2.0 * gocc - 1.0)
        score = jnp.sum(jnp.where(both, a, 0.0))
        n = jnp.maximum(jnp.sum(both.astype(jnp.float32)), 1.0)
        q = jax.nn.sigmoid(score / (n * self.dist_threshold))
        return QualityResult(quality=q, hard_discard=jnp.asarray(False))

    def evaluate(self, pairings, grids=None, global_map=None, local_map=None,
                 pose=None, ctx=None) -> QualityResult:
        if (
            global_map is None
            or local_map is None
            or self.local_layer not in getattr(local_map, "keys", lambda: {})()
        ):
            # voxel layers unavailable — neutral score
            return QualityResult(
                quality=jnp.asarray(0.5), hard_discard=jnp.asarray(False)
            )
        return self.evaluate_voxels(
            local_map[self.local_layer], global_map[self.global_layer], pose
        )
