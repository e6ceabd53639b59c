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
    # precise mode (reference: use_precise_local_velocities,
    # FilterDeskew.cpp:162-240): rotation is interpolated from the velocity-
    # buffer-reconstructed relative trajectory; translation stays the
    # constant-velocity model v*t (the reference overrides the trajectory
    # translation the same way, FilterDeskew.cpp:225-237 — IMU buffers carry
    # reliable angular rates only). The trajectory arrives via variables
    # (sm2mm injects it, mirroring the reference's attached ParameterSource):
    #   variables["trajectory_times"]    [T] seconds, relative to the scan
    #                                    reference time (t=0 in pc.time)
    #   variables["trajectory_tangents"] [T, 6] se(3) tangents (pose at t =
    #                                    exp(tangent), identity at t_ref)
    # Falls back to constant twist when the trajectory is absent
    # (reference: MRPT_LOG_THROTTLE_WARN fallback, FilterDeskew.cpp:178-184).
    use_precise_local_velocities: bool = False
    # legacy alias: method == "trajectory" behaves like
    # use_precise_local_velocities=True
    method: str = "constant_twist"  # or "trajectory"

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

        use_traj = (
            (self.use_precise_local_velocities or self.method == "trajectory")
            and variables is not None
            and "trajectory_times" in variables
        )
        tw = list(self.twist)
        if variables:
            names = ("vx", "vy", "vz", "wx", "wy", "wz")
            tw = [variables.get(n, d) for n, d in zip(names, tw)]
        twist = jnp.asarray(tw, jnp.float32)
        if use_traj:
            # precise path: searchsorted linear interpolation of the
            # reconstructed trajectory tangents at each point time
            times = jnp.asarray(variables["trajectory_times"], jnp.float32)
            tang = jnp.asarray(variables["trajectory_tangents"], jnp.float32)
            T = times.shape[0]
            i1 = jnp.clip(jnp.searchsorted(times, pc.time), 1, T - 1)
            i0 = i1 - 1
            t0, t1 = times[i0], times[i1]
            a = jnp.clip((pc.time - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
            tangents = tang[i0] * (1 - a)[:, None] + tang[i1] * a[:, None]
            # per-point correction pose applied to the point
            poses = se3.exp(tangents)  # batched Pose [C]
            # translation: constant-velocity model v*t overrides the
            # trajectory translation (reference: FilterDeskew.cpp:225-237
            # sets pose_increment.x/y/z = v*dt after the rotation lookup).
            # DELIBERATE DEVIATION: in the reference's precise branch
            # constant_twist stays default-constructed (only the non-precise
            # branch at :198 assigns it), so its v*dt translation is zero;
            # we use the configured/variables twist, which is the intended
            # physics. Parity audits of the cited lines should expect this.
            poses = se3.Pose(poses.R, pc.time[:, None] * twist[None, :3])
            new_xyz = (
                jnp.einsum("cij,cj->ci", poses.R, pc.xyz) + poses.t
            )
        else:
            # constant twist: the rotation AXIS is fixed — only the angle
            # phi = t*|w| varies per point. Closed-form fixed-axis
            # Rodrigues (exp(t*xi) exactly, same math as the generic
            # se3.exp path it replaces): ~2 crosses + 2 trig per point
            # instead of assembling per-point 3x3 R and V matrices + a
            # batched matmul. Identical results (tested to 1e-6) and
            # VPU/vmap-friendly — the einsum path cost ~2 ms per 64k scan
            # and degraded further under vmap (batched odometry).
            v = twist[:3]
            w = twist[3:]
            theta = jnp.sqrt(jnp.sum(w * w) + 1e-30)
            n = w / theta
            small = theta < 1e-8
            phi = pc.time * theta  # [C]
            sin_p = jnp.sin(phi)
            cos1_p = 1.0 - jnp.cos(phi)
            # rotation: p + sin(phi) n x p + (1-cos(phi)) n x (n x p)
            nxp = jnp.cross(jnp.broadcast_to(n, pc.xyz.shape), pc.xyz)
            nxnxp = jnp.cross(jnp.broadcast_to(n, pc.xyz.shape), nxp)
            rot_p = pc.xyz + sin_p[:, None] * nxp + cos1_p[:, None] * nxnxp
            rot_p = jnp.where(small, pc.xyz, rot_p)
            # translation: t*v + t*((1-cos phi)/phi) n x v
            #                  + t*((phi - sin phi)/phi) n x (n x v)
            nxv = jnp.cross(n, v)
            nxnxv = jnp.cross(n, nxv)
            safe_phi = jnp.where(jnp.abs(phi) < 1e-8, 1.0, phi)
            c_a = jnp.where(
                jnp.abs(phi) < 1e-8, 0.5 * phi, cos1_p / safe_phi
            )
            c_b = jnp.where(
                jnp.abs(phi) < 1e-8,
                phi * phi / 6.0,
                (phi - sin_p) / safe_phi,
            )
            trans = pc.time[:, None] * (
                v[None, :]
                + c_a[:, None] * nxv[None, :]
                + c_b[:, None] * nxnxv[None, :]
            )
            trans = jnp.where(
                small, pc.time[:, None] * v[None, :], trans
            )
            new_xyz = rot_p + trans
        new_xyz = jnp.where(pc.valid_mask()[:, None], new_xyz, pc.xyz)
        out = dict(layers)
        out[self.output_pointcloud_layer] = dataclasses.replace(pc, xyz=new_xyz)
        return out
