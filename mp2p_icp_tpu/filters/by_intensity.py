"""Intensity-band split + intensity normalisation filters.

Reference parity: mp2p_icp_filters/src/FilterByIntensity.cpp (low/mid/high
split) and FilterNormalizeIntensity.cpp (normalise to [0,1], optional
running min/max memory — here per-call min/max; running state would be a
carried pytree, planned with the pipeline-state feature).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class FilterByIntensity(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_layer_low_intensity: Optional[str] = None
    output_layer_mid_intensity: Optional[str] = None
    output_layer_high_intensity: Optional[str] = None
    low_threshold: float = 0.10
    high_threshold: float = 0.90

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.intensity is None:
            raise ValueError(
                f"FilterByIntensity: layer '{self.input_pointcloud_layer}' "
                "has no intensity channel"
            )
        i = pc.intensity
        out = dict(layers)
        if self.output_layer_low_intensity:
            out[self.output_layer_low_intensity] = compact(pc, i < self.low_threshold)
        if self.output_layer_mid_intensity:
            out[self.output_layer_mid_intensity] = compact(
                pc, (i >= self.low_threshold) & (i <= self.high_threshold)
            )
        if self.output_layer_high_intensity:
            out[self.output_layer_high_intensity] = compact(pc, i > self.high_threshold)
        return out


@dataclasses.dataclass(frozen=True)
class FilterNormalizeIntensity(FilterBase):
    pointcloud_layer: str = "raw"

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.pointcloud_layer]
        if pc.intensity is None:
            raise ValueError(
                f"FilterNormalizeIntensity: layer '{self.pointcloud_layer}' "
                "has no intensity channel"
            )
        m = pc.valid_mask()
        lo = jnp.min(jnp.where(m, pc.intensity, jnp.inf))
        hi = jnp.max(jnp.where(m, pc.intensity, -jnp.inf))
        span = jnp.maximum(hi - lo, 1e-12)
        norm = jnp.where(m, (pc.intensity - lo) / span, 0.0)
        out = dict(layers)
        out[self.pointcloud_layer] = dataclasses.replace(pc, intensity=norm)
        return out
