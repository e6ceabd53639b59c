"""LiDAR ring-id selection filter.

Reference parity: mp2p_icp_filters/src/FilterByRing.cpp — select points by
ring ids into kept/filtered-out layers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class FilterByRing(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_layer_selected: Optional[str] = None
    output_layer_non_selected: Optional[str] = None
    selected_ring_ids: Tuple[int, ...] = ()

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.ring is None:
            raise ValueError(
                f"FilterByRing: layer '{self.input_pointcloud_layer}' has no "
                "ring channel"
            )
        ring = pc.ring.astype(jnp.int32)
        sel = jnp.zeros(pc.capacity, bool)
        for rid in self.selected_ring_ids:
            sel = sel | (ring == rid)
        out = dict(layers)
        if self.output_layer_selected:
            out[self.output_layer_selected] = compact(pc, sel)
        if self.output_layer_non_selected:
            out[self.output_layer_non_selected] = compact(pc, ~sel)
        return out
