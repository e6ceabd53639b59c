"""Bounding-box split filter.

Reference parity: mp2p_icp_filters/src/FilterBoundingBox.cpp — inside /
outside axis-aligned bounding-box split.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class FilterBoundingBox(FilterBase):
    input_pointcloud_layer: str = "raw"
    inside_pointcloud_layer: Optional[str] = None
    outside_pointcloud_layer: Optional[str] = None
    bbox_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    bbox_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        mn = jnp.asarray(self.bbox_min, jnp.float32)
        mx = jnp.asarray(self.bbox_max, jnp.float32)
        inside = jnp.all((pc.xyz >= mn) & (pc.xyz <= mx), axis=-1)
        out = dict(layers)
        if self.inside_pointcloud_layer:
            out[self.inside_pointcloud_layer] = compact(pc, inside)
        if self.outside_pointcloud_layer:
            out[self.outside_pointcloud_layer] = compact(pc, ~inside)
        return out
