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
    window: int = 4  # half-window W of the row-diff stats (reference: 2W+1)

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        """Reference scoring (GeneratorEdgesFromRangeImage.cpp:100-143):
        per row, the (2W+1)-window mean/variance of the RANGE DIFFS around
        i, then score^2 = (range_i - mean_diff)^2 / var — edge when
        score^2 > score_threshold and var > 0. The ratio is scale-free, so
        float metres match the reference's fixed-point sensor units; ranges
        are quantised to integer mm so a perfectly flat integer window
        yields the reference's exact var == 0 rejection (the previous
        sign-sum score was bounded by 2*window = 8 and could NEVER reach
        the default threshold 10 — an always-empty edges layer)."""
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
        r_mm = jnp.round(jnp.linalg.norm(pc.xyz, axis=-1) * 1000.0)
        prev = jnp.clip(idx - 1, 0, C - 1)
        d = r_mm - r_mm[prev]  # diff at i (vs previous column in the row)
        d_ok = (ring[prev] == ring) & valid[prev] & valid

        # windowed stats over d[i-W .. i+W]; reference requires the FULL
        # window inside the row (i in [1+W, nCols-W))
        sum_d = jnp.zeros((C,), jnp.float32)
        full = jnp.ones((C,), bool)
        offs = list(range(-W, W + 1))
        js = [jnp.clip(idx + s, 0, C - 1) for s in offs]
        for j in js:
            ok = d_ok[j] & (ring[j] == ring)
            full = full & ok
            sum_d = sum_d + d[j]
        mean = sum_d / n
        # two-pass variance: deviations are small, so f32 stays exact
        # enough that an all-equal integer window gives var ~ 0 while the
        # smallest real integer variance is (n-1)/n^2 ~ 0.1
        var = jnp.zeros((C,), jnp.float32)
        for j in js:
            var = var + (d[j] - mean) ** 2
        var = var / n
        has_var = var > 0.05  # reference: rdVar == 0 -> never an edge
        score_sq = jnp.where(has_var, (r_mm - mean) ** 2 / jnp.maximum(var, 1e-9), 0.0)
        is_edge = valid & full & has_var & (score_sq > self.score_threshold)
        out = dict(layers)
        out[self.target_layer] = compact(pc, is_edge)
        return out
