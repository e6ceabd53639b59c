"""Edge-extraction generators for organized / scan-ordered range data.

Reference parity:
- GeneratorEdgesFromCurvature (mp2p_icp_filters/src/
  GeneratorEdgesFromCurvature.cpp:150-181, params .h:50-51): per scan row,
  the angle between consecutive point segments marks an edge when
  |v1.v2| < max_cosine * |v1||v2| (segments shorter than
  ``min_point_clearance`` are skipped).
- GeneratorEdgesFromRangeImage (src/GeneratorEdgesFromRangeImage.cpp:328,
  params .h:54): per range-image row, score each pixel by the signed
  range discontinuity count in its neighbourhood; |score| above
  ``score_threshold`` marks an edge.

TPU-first: rows become ring segments of a sorted point set; the
neighbour expressions are shifted-array arithmetic with boundary masks —
no per-row loops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class GeneratorEdgesFromCurvature(FilterBase):
    """Params (reference: GeneratorEdgesFromCurvature.h:50-51)."""

    input_pointcloud_layer: str = "raw"
    target_layer: str = "edges"
    max_cosine: float = 0.5
    min_point_clearance: float = 0.10

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.ring is None:
            raise ValueError(
                "GeneratorEdgesFromCurvature needs a 'ring' channel"
            )
        C = pc.capacity
        valid = pc.valid_mask()
        ring = pc.ring.astype(jnp.int32)
        # assume scan order within the buffer (true for raw lidar packets)
        same_prev = jnp.concatenate(
            [jnp.zeros((1,), bool), (ring[1:] == ring[:-1]) & valid[1:] & valid[:-1]]
        )
        same_next = jnp.concatenate(
            [(ring[:-1] == ring[1:]) & valid[:-1] & valid[1:], jnp.zeros((1,), bool)]
        )
        prev = jnp.clip(jnp.arange(C) - 1, 0, C - 1)
        nxt = jnp.clip(jnp.arange(C) + 1, 0, C - 1)
        v1 = pc.xyz - pc.xyz[prev]
        v2 = pc.xyz[nxt] - pc.xyz
        v1n = jnp.linalg.norm(v1, axis=-1)
        v2n = jnp.linalg.norm(v2, axis=-1)
        clearance_ok = (v1n >= self.min_point_clearance) & (
            v2n >= self.min_point_clearance
        )
        score = jnp.sum(v1 * v2, axis=-1)
        sharp = jnp.abs(score) < self.max_cosine * v1n * v2n
        is_edge = valid & same_prev & same_next & clearance_ok & sharp
        out = dict(layers)
        out[self.target_layer] = compact(pc, is_edge)
        return out


@dataclasses.dataclass(frozen=True)
class GeneratorEdgesFromRangeImage(FilterBase):
    """Params (reference: GeneratorEdgesFromRangeImage.h:54)."""

    input_pointcloud_layer: str = "raw"
    target_layer: str = "edges"
    score_threshold: int = 10
    window: int = 8  # half-window W (reference: BLOCK_BITS=3 -> W=8)
    # metres per integer range unit: the reference scores the sensor's
    # INTEGER rangeImage (sensor-specific resolution); 1 cm is a typical
    # LiDAR range quantisation
    range_resolution: float = 0.01

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        """LITERAL reference scoring (GeneratorEdgesFromRangeImage.cpp:
        83-143 with calcStats :39-60): per row, over the 2W+1 fixed-point
        RANGE DIFFS around i, mean = sum/(N-1) and var = sum_sq_dev/(N-1)
        (the reference's N-1 divisors, kept verbatim); then

            score = (range_i - mean_diff)^2 / var  >>  2*FIXED_POINT_BITS

        i.e. /65536 — an edge when score > score_threshold and var > 0.
        Note the reference compares the RANGE ITSELF against the windowed
        diff statistics (:127-130), so the score behaves as a
        range-vs-local-noise significance (fires where range >> 256 *
        diff-sigma) and var == 0 (integer-exact flat windows) never fires;
        replicated verbatim for parity, quirk and all. Ranges quantise to
        integer units of ``range_resolution`` like the sensor's rangeImage.
        (The previous sign-sum score was bounded by 2*window = 8 and could
        NEVER reach the default threshold 10 — an always-empty layer.)"""
        pc = layers[self.input_pointcloud_layer]
        if pc.ring is None:
            raise ValueError(
                "GeneratorEdgesFromRangeImage needs a 'ring' channel"
            )
        C = pc.capacity
        W = self.window
        n = 2 * W + 1
        valid = pc.valid_mask()
        ring = pc.ring.astype(jnp.int32)
        idx = jnp.arange(C)
        r_u = jnp.round(
            jnp.linalg.norm(pc.xyz, axis=-1) / self.range_resolution
        )
        prev = jnp.clip(idx - 1, 0, C - 1)
        d = r_u - r_u[prev]  # diff at i (vs previous column in the row)
        d_ok = (ring[prev] == ring) & valid[prev] & valid

        # windowed stats over d[i-W .. i+W]; reference requires the FULL
        # window inside the row (i in [1+W, nCols-W))
        sum_d = jnp.zeros((C,), jnp.float32)
        full = jnp.ones((C,), bool)
        js = [jnp.clip(idx + s, 0, C - 1) for s in range(-W, W + 1)]
        for j in js:
            ok = d_ok[j] & (ring[j] == ring)
            full = full & ok
            sum_d = sum_d + d[j]
        mean = sum_d / (n - 1)  # reference calcStats: sum/(N-1)
        # two-pass variance (deviations are small -> f32-exact enough that
        # an all-equal integer window gives var ~ 0, while the smallest
        # real integer variance is 1/(n-1))
        var = jnp.zeros((C,), jnp.float32)
        for j in js:
            var = var + (d[j] - mean) ** 2
        var = var / (n - 1)
        has_var = var > 0.03  # reference: rdVar == 0 -> never an edge
        score = jnp.where(
            has_var,
            (r_u - mean) ** 2 / jnp.maximum(var, 1e-9) / 65536.0,
            0.0,
        )
        is_edge = valid & full & has_var & (score > self.score_threshold)
        out = dict(layers)
        out[self.target_layer] = compact(pc, is_edge)
        return out
