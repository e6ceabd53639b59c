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
    window: int = 4  # half-window of the row scoring

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.ring is None:
            raise ValueError(
                "GeneratorEdgesFromRangeImage needs a 'ring' channel"
            )
        C = pc.capacity
        valid = pc.valid_mask()
        ring = pc.ring.astype(jnp.int32)
        rng = jnp.linalg.norm(pc.xyz, axis=-1)
        # signed range-step sign within the row, windows accumulated by
        # shifts (row boundaries masked by ring equality)
        score = jnp.zeros((C,), jnp.int32)
        for s in range(1, self.window + 1):
            left = jnp.clip(jnp.arange(C) - s, 0, C - 1)
            right = jnp.clip(jnp.arange(C) + s, 0, C - 1)
            same_l = (ring[left] == ring) & valid[left]
            same_r = (ring[right] == ring) & valid[right]
            score = score + jnp.where(
                same_l, jnp.sign(rng - rng[left]).astype(jnp.int32), 0
            )
            score = score + jnp.where(
                same_r, jnp.sign(rng - rng[right]).astype(jnp.int32), 0
            )
        is_edge = valid & (jnp.abs(score) >= self.score_threshold)
        out = dict(layers)
        out[self.target_layer] = compact(pc, is_edge)
        return out
