"""Sparse voxel occupancy map updates with free-space carving.

TPU-native replacement for the reference's Bonxai ``CVoxelMap`` insertion
(used by the sm2mm voxel pipelines, demos/sm2mm_bonxai_voxelmap.yaml, and by
FilterRemoveByVoxelOccupancy's static/dynamic split). Bonxai ray-casts a DDA
per point into a hashed voxel tree; here each sensor ray is sampled at a
fixed number of points (stratified along the ray), all samples of all rays
are fused with the existing voxel records by one sort + segment-sum of
log-odds deltas, and the table is rebuilt — fully batched, no tree, no
sequential inserts.

Log-odds model (matches the usual occupancy-grid update):
  endpoint voxel:  +l_hit;  traversed voxels: +l_miss (negative);
  occupancy = sigmoid(logodds).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import VoxelGridLayer

L_HIT = 1.2
L_MISS = -0.3
L_MIN, L_MAX = -6.0, 6.0
_KEY_SENT = 2147483647  # i32 max (plain int: no jnp at import — see voxel_hash note)


def _logodds(occ):
    occ = jnp.clip(occ, 1e-6, 1.0 - 1e-6)
    return jnp.log(occ / (1.0 - occ))


def _pack(cells):
    """Pack int cell coords (+-2^14 range per axis) into two sortable int32
    keys. 15 bits per packed axis keeps k1 = (c0 << 15) | c1 < 2^30 — no
    int32 overflow, and the int32-max sentinel stays unambiguous."""
    off = 1 << 14
    c = jnp.clip(cells + off, 0, 2 * off - 1)
    k1 = c[..., 0] * (1 << 15) + c[..., 1]
    k2 = c[..., 2]
    return k1, k2


def update_voxel_map(
    vg: VoxelGridLayer,
    points: jax.Array,
    point_valid: jax.Array,
    sensor_origin: jax.Array,
    ray_samples: int = 32,
    carve_free_space: bool = True,
    max_update_points: Optional[int] = None,
) -> VoxelGridLayer:
    """Insert one scan into the voxel map.

    points: [N, 3] endpoint coordinates (world frame);
    sensor_origin: [3] ray origin (world frame).
    """
    res = vg.resolution
    N = points.shape[0]

    # endpoint samples (hits)
    end_cells = jnp.floor(points / res).astype(jnp.int32)
    hit_k1, hit_k2 = _pack(end_cells)
    hit_delta = jnp.where(point_valid, L_HIT, 0.0)

    if carve_free_space:
        # stratified samples strictly inside the ray (excluding endpoint
        # voxel): t in (0, 1 - res/range)
        t = (jnp.arange(ray_samples, dtype=jnp.float32) + 0.5) / ray_samples
        ray = points - sensor_origin  # [N, 3]
        rng = jnp.linalg.norm(ray, axis=-1, keepdims=True)
        t_max = jnp.clip(1.0 - res / jnp.maximum(rng, res), 0.0, 1.0)
        samples = (
            sensor_origin
            + ray[:, None, :] * (t[None, :, None] * t_max[:, None, :])
        )  # [N, S, 3]
        free_cells = jnp.floor(samples / res).astype(jnp.int32)
        f_k1, f_k2 = _pack(free_cells.reshape(-1, 3))
        # dedup per-ray handled by the global segment-sum clamp below;
        # scale miss so multiple samples in one voxel within one ray do not
        # over-carve: expected samples per voxel ~ S * res / range
        per_vox = jnp.clip(
            ray_samples * res / jnp.maximum(rng[:, 0], res), 1.0, None
        )
        f_delta = jnp.where(
            point_valid[:, None],
            (L_MISS / per_vox[:, None]).repeat(ray_samples, axis=1),
            0.0,
        ).reshape(-1)
        upd_k1 = jnp.concatenate([hit_k1, f_k1])
        upd_k2 = jnp.concatenate([hit_k2, f_k2])
        upd_delta = jnp.concatenate([hit_delta, f_delta])
    else:
        upd_k1, upd_k2, upd_delta = hit_k1, hit_k2, hit_delta

    # existing records as (key, logodds)
    ex_k1, ex_k2 = _pack(vg.keys)
    ex_k1 = jnp.where(vg.valid, ex_k1, _KEY_SENT)
    ex_k2 = jnp.where(vg.valid, ex_k2, _KEY_SENT)
    ex_l = jnp.where(vg.valid, _logodds(vg.occupancy), 0.0)

    upd_k1 = jnp.where(upd_delta != 0.0, upd_k1, _KEY_SENT)
    upd_k2 = jnp.where(upd_delta != 0.0, upd_k2, _KEY_SENT)

    all_k1 = jnp.concatenate([ex_k1, upd_k1])
    all_k2 = jnp.concatenate([ex_k2, upd_k2])
    all_base = jnp.concatenate([ex_l, jnp.zeros_like(upd_delta)])
    all_delta = jnp.concatenate([jnp.zeros_like(ex_l), upd_delta])

    k1s, k2s, base_s, delta_s = jax.lax.sort(
        (all_k1, all_k2, all_base, all_delta), num_keys=2
    )
    M = k1s.shape[0]
    newseg = jnp.concatenate(
        [jnp.ones((1,), bool), (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
    )
    seg = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    C = vg.keys.shape[0]
    base = jax.ops.segment_sum(base_s, seg, num_segments=M)
    delta = jax.ops.segment_sum(delta_s, seg, num_segments=M)
    logodds = jnp.clip(base + delta, L_MIN, L_MAX)
    seg_valid = (
        jax.ops.segment_max(
            (k1s != _KEY_SENT).astype(jnp.int32), seg, num_segments=M
        )
        > 0
    )
    # representative key per segment
    k1_seg = jax.ops.segment_min(k1s, seg, num_segments=M)
    k2_seg = jax.ops.segment_min(k2s, seg, num_segments=M)

    # keep the C voxels with largest |logodds| information? Simpler: keep
    # first C segments (sorted by key) — deterministic; overflow drops
    # highest-key voxels. Callers size capacity accordingly.
    take = jnp.arange(C)
    valid_out = seg_valid[take] & (take < M)
    off = 1 << 14
    cx = (k1_seg[take] // (1 << 15)) - off
    cy = (k1_seg[take] % (1 << 15)) - off
    cz = k2_seg[take] - off
    keys_out = jnp.stack([cx, cy, cz], axis=-1).astype(jnp.int32)
    occ_out = jnp.where(
        valid_out, jax.nn.sigmoid(logodds[take]), 0.5
    )
    return VoxelGridLayer(
        keys=jnp.where(valid_out[:, None], keys_out, 0),
        occupancy=occ_out,
        valid=valid_out,
        resolution=res,
    )


def lookup_occupancy(
    vg: VoxelGridLayer, points: jax.Array, default: float = 0.5,
    chunk: int = 512,
) -> jax.Array:
    """Occupancy of the voxel containing each point [N, 3] -> [N].

    Chunked masked compare against the voxel records ([chunk, C] at a time,
    fully VPU-parallel). For the map sizes this framework targets
    (C <= ~1e5 occupied voxels) this beats any pointer-chasing lookup on
    TPU; a two-key binary search over the sorted records is the planned
    upgrade for larger maps.
    """
    N = points.shape[0]
    k1, k2 = _pack(jnp.floor(points / vg.resolution).astype(jnp.int32))
    ex_k1, ex_k2 = _pack(vg.keys)
    ex_k1 = jnp.where(vg.valid, ex_k1, _KEY_SENT)
    ex_k2 = jnp.where(vg.valid, ex_k2, _KEY_SENT)

    pad = (-N) % chunk
    k1p = jnp.concatenate([k1, jnp.full((pad,), _KEY_SENT - 1, jnp.int32)])
    k2p = jnp.concatenate([k2, jnp.full((pad,), _KEY_SENT - 1, jnp.int32)])

    def probe_chunk(args):
        c1, c2 = args  # [chunk]
        eq = (ex_k1[None, :] == c1[:, None]) & (ex_k2[None, :] == c2[:, None])
        hit = jnp.any(eq, axis=1)
        occ = jnp.max(jnp.where(eq, vg.occupancy[None, :], 0.0), axis=1)
        return jnp.where(hit, occ, default)

    out = jax.lax.map(
        probe_chunk,
        (k1p.reshape(-1, chunk), k2p.reshape(-1, chunk)),
    )
    return out.reshape(-1)[:N]
