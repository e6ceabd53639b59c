"""Voxel decimation filter.

Reference parity: mp2p_icp_filters/src/FilterDecimateVoxels.cpp:107-381 —
methods FirstPoint / RandomPoint / VoxelAverage / ClosestToAverage, multiple
input layers merged, ``flatten_to`` 2-D projection mode,
``minimum_input_points_to_filter`` bypass.

TPU-first: one lexicographic voxel sort (ops.voxel_unique) + segment
reductions per method — no hash maps, fully fused. The output point order is
voxel-sorted (documented deviation: the reference emits insertion order;
point sets are order-free downstream).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.ops.voxel_unique import voxel_segments


class DecimateMethod(enum.Enum):
    FIRST_POINT = "FirstPoint"
    RANDOM_POINT = "RandomPoint"
    VOXEL_AVERAGE = "VoxelAverage"
    CLOSEST_TO_AVERAGE = "ClosestToAverage"

    @staticmethod
    def from_string(s: str) -> "DecimateMethod":
        s = s.split("::")[-1]
        for m in DecimateMethod:
            if m.value.lower() == s.lower():
                return m
        raise ValueError(f"Unknown decimate method: {s!r}")


@dataclasses.dataclass(frozen=True)
class FilterDecimateVoxels(FilterBase):
    """Params (reference: FilterDecimateVoxels.h)."""

    input_pointcloud_layer: Tuple[str, ...] = ("raw",)
    output_pointcloud_layer: str = "decimated"
    voxel_filter_resolution: float = 1.0
    decimate_method: DecimateMethod = DecimateMethod.FIRST_POINT
    flatten_to: Optional[float] = None  # z value for 2-D projection mode
    minimum_input_points_to_filter: int = 0
    output_capacity: Optional[int] = None  # default: input capacity

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        inputs = [layers[name] for name in self.input_pointcloud_layer]
        xyz = jnp.concatenate([pc.xyz for pc in inputs], axis=0)
        valid = jnp.concatenate([pc.valid_mask() for pc in inputs], axis=0)
        total = sum((pc.count for pc in inputs), jnp.asarray(0, jnp.int32))

        if self.flatten_to is not None:
            xyz = jnp.where(
                valid[:, None],
                xyz.at[:, 2].set(self.flatten_to),
                xyz,
            )

        C = xyz.shape[0]
        out_cap = self.output_capacity or C
        segs = voxel_segments(
            xyz, valid, self.voxel_filter_resolution,
            flatten_z=self.flatten_to is not None,
        )
        xyz_sorted = xyz[segs.order]
        seg = segs.segment_id

        method = self.decimate_method
        if method == DecimateMethod.FIRST_POINT:
            src = self._segment_argmin(
                seg, segs.order.astype(jnp.float32), segs.valid, segs.order, C
            )
            out_xyz_all = xyz[src]
        elif method == DecimateMethod.RANDOM_POINT:
            # deterministic pseudo-random pick: minimize a hash of the index
            h = (
                (segs.order.astype(jnp.uint32) * jnp.uint32(2654435761))
                % jnp.uint32(65536)
            ).astype(jnp.float32)
            src = self._segment_argmin(seg, h, segs.valid, segs.order, C)
            out_xyz_all = xyz[src]
        elif method == DecimateMethod.VOXEL_AVERAGE:
            w = segs.valid.astype(jnp.float32)
            sums = jax.ops.segment_sum(
                xyz_sorted * w[:, None], seg, num_segments=C
            )
            cnts = jax.ops.segment_sum(w, seg, num_segments=C)
            out_xyz_all = sums / jnp.maximum(cnts, 1.0)[:, None]
            src = None
        else:  # CLOSEST_TO_AVERAGE
            w = segs.valid.astype(jnp.float32)
            sums = jax.ops.segment_sum(
                xyz_sorted * w[:, None], seg, num_segments=C
            )
            cnts = jax.ops.segment_sum(w, seg, num_segments=C)
            means = sums / jnp.maximum(cnts, 1.0)[:, None]
            d = jnp.sum(jnp.square(xyz_sorted - means[seg]), axis=-1)
            src = self._segment_argmin(seg, d, segs.valid, segs.order, C)
            out_xyz_all = xyz[src]

        n = segs.n_voxels
        take = jnp.arange(out_cap)
        out_valid = take < n
        out_xyz = jnp.where(
            out_valid[:, None],
            out_xyz_all[jnp.clip(take, 0, C - 1)],
            PointCloud.PAD_VALUE,
        )

        out = PointCloud(xyz=out_xyz, count=jnp.minimum(n, out_cap))

        # channel passthrough when a concrete source point exists
        if src is not None and len(inputs) == 1:
            pc0 = inputs[0]
            out = dataclasses.replace(
                out,
                intensity=self._gather_channel(pc0.intensity, src, take, out_valid, C),
                ring=self._gather_channel(pc0.ring, src, take, out_valid, C),
                time=self._gather_channel(pc0.time, src, take, out_valid, C),
            )

        # bypass: too few input points -> copy input through
        # (reference: minimum_input_points_to_filter)
        if self.minimum_input_points_to_filter > 0:
            if len(inputs) != 1:
                raise ValueError(
                    "minimum_input_points_to_filter bypass needs exactly "
                    "one input layer (the passthrough source is ambiguous "
                    "otherwise)"
                )
            bypass = total < self.minimum_input_points_to_filter
            pc0 = inputs[0]

            # statically resize the input to out_cap so the bypass works
            # for ANY capacity pairing (it used to be silently skipped
            # unless the capacities happened to match)
            def fit(arr, fill):
                if arr.shape[0] >= out_cap:
                    return arr[:out_cap]
                pad_shape = (out_cap - arr.shape[0],) + arr.shape[1:]
                return jnp.concatenate(
                    [arr, jnp.full(pad_shape, fill, arr.dtype)]
                )

            def fit_ch(src_ch, out_ch):
                if src_ch is None and out_ch is None:
                    return None
                s = (
                    fit(src_ch, 0.0) if src_ch is not None
                    else jnp.zeros((out_cap,), jnp.float32)
                )
                o = (
                    out_ch if out_ch is not None
                    else jnp.zeros((out_cap,), jnp.float32)
                )
                return jnp.where(bypass, s, o)

            out = PointCloud(
                xyz=jnp.where(
                    bypass, fit(pc0.xyz, PointCloud.PAD_VALUE), out.xyz
                ),
                count=jnp.where(
                    bypass,
                    jnp.minimum(pc0.count, jnp.asarray(out_cap, jnp.int32)),
                    out.count,
                ),
                intensity=fit_ch(pc0.intensity, out.intensity),
                ring=fit_ch(pc0.ring, out.ring),
                time=fit_ch(pc0.time, out.time),
            )

        new_layers = dict(layers)
        new_layers[self.output_pointcloud_layer] = out
        return new_layers

    @staticmethod
    def _segment_argmin(seg, values, valid, order, num_segments):
        """ORIGINAL-point index minimising `values` within each segment
        (values/valid are in sorted-row order; `order` maps sorted row ->
        original index). Returns [num_segments] i32 (0 where empty)."""
        big = jnp.float32(3e37)
        v = jnp.where(valid, values, big)
        mins = jax.ops.segment_min(v, seg, num_segments=num_segments)
        # winner = first sorted row achieving the min in its segment
        iswin = (v <= mins[seg]) & valid
        C = seg.shape[0]
        rownum = jnp.arange(C, dtype=jnp.int32)
        winrow = jax.ops.segment_min(
            jnp.where(iswin, rownum, C), seg, num_segments=num_segments
        )
        return order[jnp.clip(winrow, 0, C - 1)]

    @staticmethod
    def _gather_channel(ch, src, take, out_valid, C):
        if ch is None:
            return None
        all_vals = ch[src]
        return jnp.where(out_valid, all_vals[jnp.clip(take, 0, C - 1)], 0.0)