"""Motion-compensation (deskew) filter.

Reference parity: mp2p_icp_filters/src/FilterDeskew.cpp:69-275 — per-point
timestamps x (constant twist | precise LocalVelocityBuffer trajectory),
SO(3) exp forward-integration, I/R/T channels preserved. The reference's
TBB parallel_for over points (:201-271) becomes a single vmapped SE(3)
action.

Constant-twist model: point at relative time t moves by
exp(t * [vx vy vz wx wy wz]); we apply the correction so all points
correspond to the reference timestamp (t = 0).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase


@dataclasses.dataclass(frozen=True)
class FilterDeskew(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_pointcloud_layer: str = "deskewed"
    # constant twist (vx, vy, vz, wx, wy, wz); overridden by the runtime
    # variables 'vx'...'wz' when present (the reference's Parameterizable
    # twist fields, FilterDeskew.h)
    twist: Tuple[float, float, float, float, float, float] = (0, 0, 0, 0, 0, 0)
    # skip deskew entirely (reference: silently_ignore_no_timestamps)
    silently_ignore_no_timestamps: bool = False

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.time is None:
            if self.silently_ignore_no_timestamps:
                out = dict(layers)
                out[self.output_pointcloud_layer] = pc
                return out
            raise ValueError(
                f"FilterDeskew: layer '{self.input_pointcloud_layer}' has no "
                "per-point timestamps"
            )
        tw = list(self.twist)
        if variables:
            names = ("vx", "vy", "vz", "wx", "wy", "wz")
            tw = [variables.get(n, d) for n, d in zip(names, tw)]
        twist = jnp.asarray(tw, jnp.float32)

        # per-point correction pose: exp(t_i * twist) applied to the point
        tangents = pc.time[:, None] * twist[None, :]
        poses = se3.exp(tangents)  # batched Pose [C]
        new_xyz = (
            jnp.einsum("cij,cj->ci", poses.R, pc.xyz) + poses.t
        )
        new_xyz = jnp.where(pc.valid_mask()[:, None], new_xyz, pc.xyz)
        out = dict(layers)
        out[self.output_pointcloud_layer] = dataclasses.replace(pc, xyz=new_xyz)
        return out
