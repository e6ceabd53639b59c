"""Shared helpers for mask-based filters."""

from __future__ import annotations

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud


def compact(pc: PointCloud, keep: jnp.ndarray) -> PointCloud:
    """New PointCloud with the masked points compacted to the front
    (stable order). The static-shape equivalent of the reference's
    conditional insertPoint loops."""
    C = pc.capacity
    keep = keep & pc.valid_mask()
    order = jnp.argsort(~keep, stable=True)  # kept rows first, stable
    n = jnp.sum(keep.astype(jnp.int32))
    in_range = jnp.arange(C) < n
    xyz = jnp.where(
        in_range[:, None], pc.xyz[order], PointCloud.PAD_VALUE
    )

    def ch(c):
        if c is None:
            return None
        return jnp.where(in_range, c[order], 0.0)

    return PointCloud(
        xyz=xyz, count=n, intensity=ch(pc.intensity), ring=ch(pc.ring),
        time=ch(pc.time),
    )
