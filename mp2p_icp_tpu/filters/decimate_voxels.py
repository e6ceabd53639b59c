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
from mp2p_icp_tpu.ops.voxel_unique import first_point_select, voxel_segments


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
    # 'sort' = lexicographic voxel sort (any method; output voxel-sorted);
    # 'hash' = scratch hash table (FIRST_POINT only; output in input
    # order — the reference's own insertion order,
    # FilterDecimateVoxels.cpp:244-270 — and O(n) instead of a full-
    # capacity bitonic sort; the odometry fast path)
    backend: str = "sort"

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        if self.backend == "hash":
            return self._call_hash(layers)
        inputs = [layers[name] for name in self.input_pointcloud_layer]
        xyz = jnp.concatenate([pc.xyz for pc in inputs], axis=0)
        valid = jnp.concatenate([pc.valid_mask() for pc in inputs], axis=0)

        if self.flatten_to is not None:
            xyz = jnp.where(
                valid[:, None],
                xyz.at[:, 2].set(self.flatten_to),
                xyz,
            )

        C = xyz.shape[0]
        out_cap = self.output_capacity or C

        # PER-MAP bypass (reference FilterDecimateVoxels.cpp:158-192): an
        # input map with size <= minimum is copied through VERBATIM and
        # excluded from the voxel filter; larger maps decimate as usual.
        min_pts = self.minimum_input_points_to_filter
        bypass_pt = None
        valid_decim = valid
        if min_pts > 0:
            if len(inputs) * min_pts > out_cap:
                raise ValueError(
                    "minimum_input_points_to_filter bypass could overflow "
                    f"output_capacity: {len(inputs)} input layer(s) x "
                    f"minimum {min_pts} > output_capacity {out_cap} — the "
                    "reference copies every below-minimum map verbatim, so "
                    "size output_capacity accordingly"
                )
            bypass_pt = jnp.concatenate([
                jnp.broadcast_to(pc.count <= min_pts, (pc.capacity,))
                for pc in inputs
            ])
            valid_decim = valid & ~bypass_pt

        method = self.decimate_method
        if method == DecimateMethod.FIRST_POINT:
            # scatter-free fast path (stable sort + searchsorted — see
            # ops.voxel_unique.first_point_select; winner = lowest input
            # index, identical to the segment-argmin it replaced); also
            # vmap-safe via its custom_vmap flat-sort rule
            src, n = first_point_select(
                xyz, valid_decim, self.voxel_filter_resolution,
                out_cap, flatten_z=self.flatten_to is not None,
            )
            out_xyz_all = xyz[jnp.clip(src, 0, C - 1)]  # [out_cap, 3]
            return self._emit(
                layers, inputs, xyz, valid, src, out_xyz_all, n, out_cap, C,
                bypass_pt,
            )

        segs = voxel_segments(
            xyz, valid_decim, self.voxel_filter_resolution,
            flatten_z=self.flatten_to is not None,
        )
        xyz_sorted = xyz[segs.order]
        seg = segs.segment_id

        if method == DecimateMethod.RANDOM_POINT:
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

        return self._emit(
            layers, inputs, xyz, valid, src, out_xyz_all, segs.n_voxels,
            out_cap, C, bypass_pt,
        )

    def _emit(self, layers, inputs, xyz, valid, src, out_xyz_all, n,
              out_cap, C, bypass_pt):
        """Shared output assembly: take the first min(n, out_cap) voxel
        reps, ride channels, append bypassed maps."""
        take = jnp.arange(out_cap)
        out_valid = take < n
        src_rows = out_xyz_all.shape[0]  # C (segment paths) or out_cap
        out_xyz = jnp.where(
            out_valid[:, None],
            out_xyz_all[jnp.clip(take, 0, src_rows - 1)],
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

        # append the BYPASSED maps' points verbatim after the decimated
        # block (reference inserts them into the same output cloud,
        # FilterDecimateVoxels.cpp:168-186); channels ride along. Works
        # for any capacity pairing — it used to be silently skipped
        # unless the capacities happened to match.
        if bypass_pt is not None:
            byp = valid & bypass_pt
            rank = jnp.cumsum(byp.astype(jnp.int32)) - 1
            dest = jnp.where(byp, out.count + rank, out_cap)
            dest = jnp.clip(dest, 0, out_cap)
            n_byp = jnp.sum(byp.astype(jnp.int32))
            new_xyz = (
                jnp.concatenate(
                    [out.xyz,
                     jnp.zeros((1, 3), out.xyz.dtype)]
                ).at[dest].set(xyz)[:out_cap]
            )

            def append_ch(out_ch, chs):
                if out_ch is None and all(c is None for c in chs):
                    return None
                o = (
                    out_ch if out_ch is not None
                    else jnp.zeros((out_cap,), jnp.float32)
                )
                s = jnp.concatenate([
                    c if c is not None
                    else jnp.zeros((pc.capacity,), jnp.float32)
                    for pc, c in zip(inputs, chs)
                ])
                return (
                    jnp.concatenate([o, jnp.zeros((1,), o.dtype)])
                    .at[dest].set(s)[:out_cap]
                )

            out = PointCloud(
                xyz=new_xyz,
                count=jnp.minimum(
                    out.count + n_byp, jnp.asarray(out_cap, jnp.int32)
                ),
                intensity=append_ch(
                    out.intensity, [pc.intensity for pc in inputs]
                ),
                ring=append_ch(out.ring, [pc.ring for pc in inputs]),
                time=append_ch(out.time, [pc.time for pc in inputs]),
            )

        new_layers = dict(layers)
        new_layers[self.output_pointcloud_layer] = out
        return new_layers

    def _call_hash(self, layers: Dict[str, PointCloud]):
        if self.decimate_method != DecimateMethod.FIRST_POINT:
            raise ValueError(
                "backend='hash' supports FIRST_POINT only (got "
                f"{self.decimate_method})"
            )
        if self.flatten_to is not None:
            raise ValueError("backend='hash' does not support flatten_to")
        if self.minimum_input_points_to_filter > 0:
            raise ValueError(
                "backend='hash' does not support "
                "minimum_input_points_to_filter"
            )
        from mp2p_icp_tpu.ops.voxel_hash_map import (
            hash_decimate_first_point,
        )

        inputs = [layers[name] for name in self.input_pointcloud_layer]
        if len(inputs) == 1:
            src = inputs[0]
            valid = src.valid_mask()
        else:
            # concat inputs; channels only ride the single-input case
            # (same contract as the sort backend)
            src = PointCloud(
                xyz=jnp.concatenate([pc.xyz for pc in inputs], axis=0),
                count=sum(pc.count for pc in inputs),
            )
            valid = jnp.concatenate(
                [pc.valid_mask() for pc in inputs], axis=0
            )
        out_cap = self.output_capacity or src.capacity
        out = hash_decimate_first_point(
            src, self.voxel_filter_resolution, out_cap, valid=valid
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
        all_vals = ch[jnp.clip(src, 0, ch.shape[0] - 1)]
        rows = all_vals.shape[0]  # C (segment paths) or out_cap
        return jnp.where(
            out_valid, all_vals[jnp.clip(take, 0, rows - 1)], 0.0
        )