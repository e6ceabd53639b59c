"""Range gate filter.

Reference parity: mp2p_icp_filters/src/FilterByRange.cpp — keep/split points
by min/max range from a (parameterisable) centre point.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class FilterByRange(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_layer_between: Optional[str] = None  # range in [min, max]
    output_layer_outside: Optional[str] = None  # range outside [min, max]
    range_min: float = 0.0
    range_max: float = 100.0
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        center = jnp.asarray(self.center, jnp.float32)
        if variables:
            center = jnp.asarray(
                [
                    variables.get("robot_x", self.center[0]),
                    variables.get("robot_y", self.center[1]),
                    variables.get("robot_z", self.center[2]),
                ],
                jnp.float32,
            )
        r = jnp.linalg.norm(pc.xyz - center, axis=-1)
        between = (r >= self.range_min) & (r <= self.range_max)
        out = dict(layers)
        if self.output_layer_between:
            out[self.output_layer_between] = compact(pc, between)
        if self.output_layer_outside:
            out[self.output_layer_outside] = compact(pc, ~between)
        return out
