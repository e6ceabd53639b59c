"""Padded structure-of-arrays point clouds.

TPU-native replacement for the reference's ``mrpt::maps::CPointsMap`` family
(SoA float x/y/z + optional intensity/ring/timestamp channels — reference:
mp2p_icp_filters/src/FilterDeskew.cpp:111-123 channel access,
mp2p_icp_map/src/pointcloud_sanity_check.cpp:27-76 channel validation).

Design: XLA requires static shapes, so a cloud is a fixed-capacity ``[C, 3]``
array plus a validity count; every consumer masks with ``valid_mask()``.
Capacities are rounded up to a small set of buckets so recompiles are rare.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def round_capacity(n: int, minimum: int = 256) -> int:
    """Round n up to the next power of two (>= minimum) to bucket shapes and
    bound jit recompiles. The reference has no analogue: C++ vectors resize
    freely; on TPU shape stability is the scarce resource."""
    c = max(int(minimum), 1)
    while c < n:
        c *= 2
    return c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity SoA point cloud.

    xyz:       [C, 3] float32; rows >= count are padding (value = pad_point,
               a far-away sentinel so accidental uses never match anything).
    count:     scalar int32 — number of valid leading rows.
    intensity / ring / time: optional [C] channels (reference XYZIRT clouds).
    """

    xyz: jax.Array
    count: jax.Array
    intensity: Optional[jax.Array] = None
    ring: Optional[jax.Array] = None
    time: Optional[jax.Array] = None
    # optional per-point unit normals [C, 3] (zeros = no reliable plane);
    # the TPU analogue of the reference's plane-capable maps
    # (NearestPlaneCapable / NDT voxel maps) — see ops/normals.py
    normals: Optional[jax.Array] = None

    PAD_VALUE = 1.0e8  # sentinel coordinate for padding rows

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def valid_mask(self) -> jax.Array:
        return jnp.arange(self.capacity) < self.count

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        capacity: Optional[int] = None,
        intensity: Optional[np.ndarray] = None,
        ring: Optional[np.ndarray] = None,
        time: Optional[np.ndarray] = None,
    ) -> "PointCloud":
        xyz = np.asarray(xyz, dtype=np.float32).reshape(-1, 3)
        n = xyz.shape[0]
        cap = capacity or round_capacity(n)
        if cap < n:
            raise ValueError(f"capacity {cap} < point count {n}")
        buf = np.full((cap, 3), PointCloud.PAD_VALUE, dtype=np.float32)
        buf[:n] = xyz

        def pad_channel(ch, fill=0.0):
            if ch is None:
                return None
            ch = np.asarray(ch, dtype=np.float32).reshape(-1)
            if ch.shape[0] != n:
                raise ValueError("channel length mismatch")
            out = np.full((cap,), fill, dtype=np.float32)
            out[:n] = ch
            return jnp.asarray(out)

        return PointCloud(
            xyz=jnp.asarray(buf),
            count=jnp.asarray(n, dtype=jnp.int32),
            intensity=pad_channel(intensity),
            ring=pad_channel(ring),
            time=pad_channel(time),
        )

    @staticmethod
    def empty(capacity: int) -> "PointCloud":
        return PointCloud(
            xyz=jnp.full((capacity, 3), PointCloud.PAD_VALUE, dtype=jnp.float32),
            count=jnp.asarray(0, dtype=jnp.int32),
        )

    def to_numpy(self) -> np.ndarray:
        n = int(self.count)
        return np.asarray(self.xyz[:n])

    def bounding_box(self):
        """(min, max) over valid points; (+inf, -inf) pair if empty."""
        m = self.valid_mask()[:, None]
        big = jnp.asarray(jnp.inf, dtype=self.xyz.dtype)
        mn = jnp.min(jnp.where(m, self.xyz, big), axis=0)
        mx = jnp.max(jnp.where(m, self.xyz, -big), axis=0)
        return mn, mx

    def transformed(self, pose) -> "PointCloud":
        """Rigidly transform valid points (padding rows stay at sentinel);
        normals rotate with the pose."""
        from mp2p_icp_tpu.core import se3

        new_xyz = se3.apply(pose, self.xyz)
        new_xyz = jnp.where(self.valid_mask()[:, None], new_xyz, self.xyz)
        nrm = self.normals
        if nrm is not None:
            nrm = jnp.where(
                self.valid_mask()[:, None], nrm @ pose.R.T, nrm
            )
        return dataclasses.replace(self, xyz=new_xyz, normals=nrm)

    def with_points(self, xyz: jax.Array, count: jax.Array) -> "PointCloud":
        return dataclasses.replace(self, xyz=xyz, count=count)


def sanity_check(pc: PointCloud) -> bool:
    """Channel-length validation (reference: pointcloud_sanity_check.cpp:27-76).
    With static SoA shapes this reduces to capacity equality checks."""
    for ch in (pc.intensity, pc.ring, pc.time, pc.normals):
        if ch is not None and ch.shape[0] != pc.capacity:
            return False
    return int(pc.count) <= pc.capacity
