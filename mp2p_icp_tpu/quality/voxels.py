"""Voxel-occupancy quality evaluator.

Reference parity: mp2p_icp/src/QualityEvaluator_Voxels.cpp:40-170 —
symmetric two-pass comparison of the local & global voxel grids: each
grid's cells are transformed into the other grid, co-observed cell pairs
accumulate the reference's fitted quadratic agreement loss

    loss(x, y) = 1.5 + x + y - 12x^2 + 22xy - 12y^2
    (QualityEvaluator_Voxels.cpp:43-57; +1 at matching definite states,
     -10 at conflicting ones)

skipping barely-observed cells (|occ - 0.5| < 0.01, :127), and
quality = sigmoid(dist2quality_scale * mean_loss), 0 when no cell pairs
(:157-162). Missing/wrong-type layers RAISE, as the reference throws
(:66-91) — a misconfigured pipeline must not get a plausible score.

TPU-first: both grids are VoxelGridLayer tensors; the cross-grid cell
lookup is a sort + searchsorted merge over packed cell codes (the
reference walks Bonxai accessors cell-by-cell), so the whole evaluation is
O((L + C) log C) fused XLA with no [L, C] blow-up.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import VoxelGridLayer
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.quality.paired_ratio import QualityResult


def _loss(x, y):
    """Fitted quadratic agreement surface (QualityEvaluator_Voxels.cpp:55)."""
    return 1.5 + x + y - 12.0 * x * x + 22.0 * x * y - 12.0 * y * y


def _pack(keys):
    """[N, 3] int32 cell coords -> 31-bit Teschner spatial-hash codes
    (same constants as the reference's decimation hash). A truncated
    bit-pack (10 bits/axis, r3) systematically ALIASED cells 1024 apart —
    silent lookup misses beyond ±512 cells of the origin, i.e. ±256 m at
    a 0.5 m grid, which KITTI-scale maps exceed. Hash collisions are
    instead uniform-random (~10² colliding pairs per 10⁶ cells over 2³¹
    codes); the lookup below probes ``_PROBE`` sorted slots and verifies
    the TRUE integer keys, so a false match is impossible and a miss
    requires ≥_PROBE distinct cells sharing one 31-bit hash (vanishing
    probability at any realistic map size — exact for ANY extent in
    practice)."""
    h = (
        (keys[:, 0] * jnp.int32(73856093))
        ^ (keys[:, 1] * jnp.int32(19349663))
        ^ (keys[:, 2] * jnp.int32(83492791))
    ) & jnp.int32(0x7FFFFFFF)
    # keep every code strictly below the invalid-row sentinel (i32 max)
    return jnp.minimum(h, jnp.int32(0x7FFFFFFE))


_PROBE = 8


def lookup_occupancy(layer: VoxelGridLayer, qkeys, qvalid):
    """Occupancy of ``layer`` at integer cell coords qkeys [L, 3].
    Returns (occ [L], found [L]). Sorted-code searchsorted with a
    ``_PROBE``-slot collision probe (duplicate codes sort adjacently; true
    keys verified per slot)."""
    codes = jnp.where(layer.valid, _pack(layer.keys), jnp.int32(2**31 - 1))
    order = jnp.argsort(codes)
    scodes = codes[order]
    skeys = layer.keys[order]
    socc = layer.occupancy[order]
    svalid = layer.valid[order]
    qc = _pack(qkeys)
    pos = jnp.searchsorted(scodes, qc)
    C = scodes.shape[0]
    found = jnp.zeros(qc.shape, bool)
    occ = jnp.full(qc.shape, 0.5, jnp.float32)
    for off in range(_PROBE):
        p = jnp.clip(pos + off, 0, C - 1)
        hit = (
            (scodes[p] == qc)
            & jnp.all(skeys[p] == qkeys, axis=-1)
            & svalid[p]
            & ~found
        )
        occ = jnp.where(hit, socc[p], occ)
        found = found | hit
    return occ, found & qvalid


@dataclasses.dataclass(frozen=True)
class QualityVoxels:
    """Params (reference: QualityEvaluator_Voxels.h:40-45)."""

    voxel_layer_name: str = "voxelmap"
    dist2quality_scale: float = 2.0
    weight: float = 1.0
    # legacy aliases (pre-r2 API); voxel_layer_name wins when layers share it
    local_layer: str = ""
    global_layer: str = ""

    def _layer_names(self):
        loc = self.local_layer or self.voxel_layer_name
        glo = self.global_layer or self.voxel_layer_name
        return loc, glo

    def evaluate_voxels(
        self, local: VoxelGridLayer, globl: VoxelGridLayer, pose: Pose
    ) -> QualityResult:
        eps = 0.01

        def one_pass(src, dst, transform):
            centers = transform(src.centers())
            keys = jnp.floor(centers / dst.resolution).astype(jnp.int32)
            occ_dst, found = lookup_occupancy(dst, keys, src.valid)
            occ_src = src.occupancy
            counted = (
                found
                & (jnp.abs(occ_src - 0.5) >= eps)
                & (jnp.abs(occ_dst - 0.5) >= eps)
            )
            d = _loss(occ_src, occ_dst)
            return (
                jnp.sum(jnp.where(counted, d, 0.0)),
                jnp.sum(counted.astype(jnp.int32)),
            )

        # local cells -> global grid, then global cells -> local grid
        # (QualityEvaluator_Voxels.cpp:109-155 runs both directions)
        inv = se3.inverse(pose)
        s1, n1 = one_pass(local, globl, lambda c: se3.apply(pose, c))
        s2, n2 = one_pass(globl, local, lambda c: se3.apply(inv, c))
        n = n1 + n2
        dist = jnp.where(n > 0, (s1 + s2) / jnp.maximum(n, 1), 0.0)
        q = jnp.where(
            n > 0, jax.nn.sigmoid(self.dist2quality_scale * dist), 0.0
        )
        return QualityResult(quality=q, hard_discard=jnp.asarray(False))

    def evaluate(self, pairings, grids=None, global_map=None, local_map=None,
                 pose=None, ctx=None) -> QualityResult:
        loc_name, glo_name = self._layer_names()
        for name, m, side in ((loc_name, local_map, "local"),
                              (glo_name, global_map, "global")):
            if m is None or name not in m:
                raise ValueError(
                    f"QualityEvaluator_Voxels: {side} map has no layer "
                    f"'{name}' (reference throws here too, "
                    "QualityEvaluator_Voxels.cpp:66-91)"
                )
            if not isinstance(m[name], VoxelGridLayer):
                raise ValueError(
                    f"QualityEvaluator_Voxels: {side} layer '{name}' must "
                    "be a voxel grid"
                )
        return self.evaluate_voxels(
            local_map[loc_name], global_map[glo_name], pose
        )
