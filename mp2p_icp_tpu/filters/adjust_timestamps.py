"""Per-point timestamp normalisation filter.

Reference parity: mp2p_icp_filters/src/FilterAdjustTimestamps.cpp — methods
(EarliestIsZero / MiddleIsZero / Normalize) + fixed time_offset.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase


class TimestampAdjustMethod(enum.Enum):
    EARLIEST_IS_ZERO = "EarliestIsZero"
    MIDDLE_IS_ZERO = "MiddleIsZero"
    NORMALIZE = "Normalize"  # to [0, 1]

    @staticmethod
    def from_string(s: str) -> "TimestampAdjustMethod":
        s = s.split("::")[-1]
        for m in TimestampAdjustMethod:
            if m.value.lower() == s.lower():
                return m
        raise ValueError(f"Unknown timestamp adjust method: {s!r}")


@dataclasses.dataclass(frozen=True)
class FilterAdjustTimestamps(FilterBase):
    pointcloud_layer: str = "raw"
    method: TimestampAdjustMethod = TimestampAdjustMethod.MIDDLE_IS_ZERO
    time_offset: float = 0.0
    silently_ignore_no_timestamps: bool = False

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.pointcloud_layer]
        if pc.time is None:
            if self.silently_ignore_no_timestamps:
                return dict(layers)
            raise ValueError(
                f"FilterAdjustTimestamps: layer '{self.pointcloud_layer}' "
                "has no timestamps"
            )
        m = pc.valid_mask()
        lo = jnp.min(jnp.where(m, pc.time, jnp.inf))
        hi = jnp.max(jnp.where(m, pc.time, -jnp.inf))
        if self.method == TimestampAdjustMethod.EARLIEST_IS_ZERO:
            t = pc.time - lo
        elif self.method == TimestampAdjustMethod.MIDDLE_IS_ZERO:
            t = pc.time - 0.5 * (lo + hi)
        else:
            t = (pc.time - lo) / jnp.maximum(hi - lo, 1e-12)
        t = jnp.where(m, t + self.time_offset, 0.0)
        out = dict(layers)
        out[self.pointcloud_layer] = dataclasses.replace(pc, time=t)
        return out
