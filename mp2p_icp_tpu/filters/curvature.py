"""Ring-ordered curvature classification filter.

Reference parity: mp2p_icp_filters/src/FilterCurvature.cpp:59-251 — per
LiDAR ring: (1) drop points closer than ``min_clearance`` (inf-norm) to
their predecessor; (2) for each kept point, look at its ring neighbours
(wrapping): a gap larger than ``max_gap`` marks a discontinuity border
(classified "larger" when this edge is nearer the sensor, else "other");
otherwise the angle between the incoming/outgoing segments decides:
|cos| < max_cosine -> larger curvature, else smaller. Rings with <= 3
points are accepted wholesale as "larger".

TPU-first: points are sorted by (ring, scan order) once; all per-ring
recurrences become segment ops with wrap-around via ring-start/end
indices. Documented deviation: the clearance test compares against the
*previous raw* ring point rather than the previous *accepted* one (the
reference's sequential dependency); on real scans the two differ only for
runs of sub-clearance points.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact


@dataclasses.dataclass(frozen=True)
class FilterCurvature(FilterBase):
    """Params (reference: FilterCurvature.h:54-70, defaults preserved)."""

    input_pointcloud_layer: str = "raw"
    output_layer_larger_curvature: Optional[str] = None
    output_layer_smaller_curvature: Optional[str] = None
    output_layer_other: Optional[str] = None
    max_cosine: float = 0.5
    min_clearance: float = 0.02
    max_gap: float = 1.00

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        if pc.ring is None:
            raise ValueError(
                f"FilterCurvature: layer '{self.input_pointcloud_layer}' "
                "needs a 'ring' channel"
            )
        if not (self.output_layer_larger_curvature
                or self.output_layer_smaller_curvature):
            raise ValueError(
                "FilterCurvature: at least one of larger/smaller output "
                "layers must be set"
            )
        C = pc.capacity
        valid = pc.valid_mask()
        ring = jnp.where(valid, pc.ring.astype(jnp.int32), jnp.int32(1 << 20))
        idx = jnp.arange(C, dtype=jnp.int32)
        rs, order = jax.lax.sort((ring, idx), num_keys=2)
        xyz_s = pc.xyz[order]
        valid_s = rs < (1 << 20)

        # ring segments over sorted rows
        new_ring = jnp.concatenate(
            [jnp.ones((1,), bool), rs[1:] != rs[:-1]]
        )
        row = jnp.arange(C, dtype=jnp.int32)

        # (1) clearance vs previous raw ring point
        prev_raw = jnp.clip(row - 1, 0, C - 1)
        d_prev = jnp.abs(xyz_s - xyz_s[prev_raw]).max(axis=-1)
        first_in_ring = new_ring
        accept = valid_s & (first_in_ring | (d_prev >= self.min_clearance))

        # compact accepted rows (stable, keeps ring-order)
        acc_order = jnp.argsort(~accept, stable=True)
        n_acc = jnp.sum(accept.astype(jnp.int32))
        a_valid = jnp.arange(C) < n_acc
        a_xyz = xyz_s[acc_order]
        a_ring = rs[acc_order]
        a_orig = order[acc_order]  # original point index of accepted row

        # ring segments over accepted rows
        a_new = jnp.concatenate(
            [jnp.ones((1,), bool), a_ring[1:] != a_ring[:-1]]
        ) | ~a_valid
        a_seg = jnp.cumsum(a_new.astype(jnp.int32)) - 1
        a_start = jax.ops.segment_min(
            jnp.where(a_valid, row, C), a_seg, num_segments=C
        )
        a_end = jax.ops.segment_max(
            jnp.where(a_valid, row, -1), a_seg, num_segments=C
        )
        ring_size = jnp.maximum(a_end[a_seg] - a_start[a_seg] + 1, 0)

        # wrap-around neighbours within the ring
        im1 = jnp.where(row > a_start[a_seg], row - 1, a_end[a_seg])
        ip1 = jnp.where(row < a_end[a_seg], row + 1, a_start[a_seg])
        im1 = jnp.clip(im1, 0, C - 1)
        ip1 = jnp.clip(ip1, 0, C - 1)
        pt, ptm1, ptp1 = a_xyz, a_xyz[im1], a_xyz[ip1]

        gap_sqr = self.max_gap**2
        d_m1 = jnp.sum(jnp.square(pt - ptm1), axis=-1)
        d_p1 = jnp.sum(jnp.square(pt - ptp1), axis=-1)
        at_gap = (d_m1 > gap_sqr) | (d_p1 > gap_sqr)
        nearer = jnp.sum(pt * pt, -1) < jnp.sum(ptm1 * ptm1, -1)

        v1 = pt - ptm1
        v2 = ptp1 - pt
        v1n = jnp.linalg.norm(v1, axis=-1)
        v2n = jnp.linalg.norm(v2, axis=-1)
        score = jnp.sum(v1 * v2, axis=-1)
        sharp = jnp.abs(score) < self.max_cosine * v1n * v2n

        tiny_ring = ring_size <= 3
        larger = a_valid & (
            tiny_ring | (at_gap & nearer) | (~at_gap & sharp)
        )
        other = a_valid & ~tiny_ring & at_gap & ~nearer
        smaller = a_valid & ~tiny_ring & ~at_gap & ~sharp

        def to_orig(mask):
            safe = jnp.where(mask, a_orig, C)
            return (
                jnp.zeros((C + 1,), bool).at[safe].set(True)
            )[:C]

        out = dict(layers)
        if self.output_layer_larger_curvature:
            out[self.output_layer_larger_curvature] = compact(pc, to_orig(larger))
        if self.output_layer_smaller_curvature:
            out[self.output_layer_smaller_curvature] = compact(pc, to_orig(smaller))
        if self.output_layer_other:
            out[self.output_layer_other] = compact(pc, to_orig(other))
        return out
