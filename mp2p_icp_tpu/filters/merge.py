"""Layer-merge filter — the map-update step of sm2mm pipelines.

Reference parity: mp2p_icp_filters/src/FilterMerge.cpp — insert an input
layer into a target layer with an optional SE(3) ``robot_pose``
(parameterisable via the robot_x..robot_roll variables).

TPU-first: the target layer is a fixed-capacity rolling buffer; new points
are written at ``count`` onward (dropping overflow — callers size the
capacity; a future ring-buffer mode will wrap).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase


@dataclasses.dataclass(frozen=True)
class FilterMerge(FilterBase):
    input_pointcloud_layer: str = "raw"
    target_layer: str = "map"
    target_capacity: int = 1 << 20  # used when the target doesn't exist yet
    # reference default: input_layer_in_local_coordinates = false
    # (FilterMerge.cpp:96-108) — an already-world-frame input must NOT be
    # transformed by the robot pose; set True only for vehicle-frame inputs
    use_robot_pose: bool = False

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        src = layers[self.input_pointcloud_layer]
        xyz = src.xyz
        if self.use_robot_pose and variables:
            pose = se3.from_xyz_ypr(
                variables.get("robot_x", 0.0),
                variables.get("robot_y", 0.0),
                variables.get("robot_z", 0.0),
                variables.get("robot_yaw", 0.0),
                variables.get("robot_pitch", 0.0),
                variables.get("robot_roll", 0.0),
            )
            xyz = jnp.where(
                src.valid_mask()[:, None], se3.apply(pose, src.xyz), src.xyz
            )

        out = dict(layers)
        if self.target_layer not in layers:
            target = PointCloud.empty(self.target_capacity)
        else:
            target = layers[self.target_layer]

        C = target.capacity
        # scatter the source's valid points at target.count onward
        src_rank = jnp.cumsum(src.valid_mask().astype(jnp.int32)) - 1
        dest = jnp.where(
            src.valid_mask(), target.count + src_rank, C
        )  # invalid -> dump slot
        dest = jnp.clip(dest, 0, C)
        new_xyz = (
            jnp.concatenate([target.xyz, jnp.zeros((1, 3), target.xyz.dtype)])
            .at[dest]
            .set(xyz)[:C]
        )
        n_new = jnp.minimum(
            target.count + src.count, jnp.asarray(C, jnp.int32)
        )

        # per-point channels ride the same scatter (the reference's
        # insertAnotherMap copies full point records) — a channel present
        # on either side is kept, zero-filled where the other lacks it
        def merge_ch(t_ch, s_ch):
            if t_ch is None and s_ch is None:
                return None
            t = (
                t_ch if t_ch is not None
                else jnp.zeros((C,), jnp.float32)
            )
            s = (
                s_ch if s_ch is not None
                else jnp.zeros((src.capacity,), jnp.float32)
            )
            return (
                jnp.concatenate([t, jnp.zeros((1,), t.dtype)])
                .at[dest]
                .set(s)[:C]
            )

        def merge_ch3(t_ch, s_ch):
            if t_ch is None and s_ch is None:
                return None
            t = (
                t_ch if t_ch is not None
                else jnp.zeros((C, 3), jnp.float32)
            )
            s = (
                s_ch if s_ch is not None
                else jnp.zeros((src.capacity, 3), jnp.float32)
            )
            return (
                jnp.concatenate([t, jnp.zeros((1, 3), t.dtype)])
                .at[dest]
                .set(s)[:C]
            )

        # normals rotate with the robot pose when one was applied
        src_normals = src.normals
        if src_normals is not None and self.use_robot_pose and variables:
            src_normals = jnp.where(
                src.valid_mask()[:, None], src_normals @ pose.R.T,
                src_normals,
            )
        out[self.target_layer] = PointCloud(
            xyz=new_xyz,
            count=n_new,
            intensity=merge_ch(target.intensity, src.intensity),
            ring=merge_ch(target.ring, src.ring),
            time=merge_ch(target.time, src.time),
            normals=merge_ch3(target.normals, src_normals),
        )
        return out
