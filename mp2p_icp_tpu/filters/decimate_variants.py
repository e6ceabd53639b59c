"""Distance-warped and target-count adaptive voxel decimation.

Reference parity:
- FilterDecimateVoxelsQuadratic (mp2p_icp_filters/src/
  FilterDecimateVoxelsQuadratic.cpp, params .h:62-112): voxel size grows
  quadratically with range — realised by warping coordinates with
  s(r) = 1 / (1 + r / R_ref) before voxelisation, so nearby geometry keeps
  fine resolution while far points collapse into coarser voxels.
- FilterDecimateAdaptive (src/FilterDecimateAdaptive.cpp, params
  .h:55-69): pick the voxel size that yields approximately
  ``desired_output_point_count`` points from the cloud's bounding box,
  clamped by ``maximum_voxel_count_per_dimension``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.decimate_voxels import DecimateMethod, FilterDecimateVoxels


@dataclasses.dataclass(frozen=True)
class FilterDecimateVoxelsQuadratic(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_pointcloud_layer: str = "decimated"
    voxel_filter_resolution: float = 0.20
    quadratic_reference_radius: float = 20.0
    decimate_method: DecimateMethod = DecimateMethod.FIRST_POINT

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        r = jnp.linalg.norm(pc.xyz, axis=-1, keepdims=True)
        s = 1.0 / (1.0 + r / self.quadratic_reference_radius)
        warped = jnp.where(pc.valid_mask()[:, None], pc.xyz * s, pc.xyz)
        # voxelise in warped space, then emit each voxel's representative
        # (first) point in ORIGINAL coordinates
        from mp2p_icp_tpu.ops.voxel_unique import voxel_segments

        segs = voxel_segments(
            warped, pc.valid_mask(), self.voxel_filter_resolution
        )
        src = FilterDecimateVoxels._segment_argmin(
            segs.segment_id,
            segs.order.astype(jnp.float32),
            segs.valid,
            segs.order,
            pc.capacity,
        )
        n = segs.n_voxels
        take = jnp.arange(pc.capacity)
        ok = take < n
        out_xyz = jnp.where(
            ok[:, None],
            pc.xyz[src][jnp.clip(take, 0, pc.capacity - 1)],
            PointCloud.PAD_VALUE,
        )
        out = dict(layers)
        out[self.output_pointcloud_layer] = PointCloud(xyz=out_xyz, count=n)
        return out


@dataclasses.dataclass(frozen=True)
class FilterDecimateAdaptive(FilterBase):
    input_pointcloud_layer: str = "raw"
    output_pointcloud_layer: str = "decimated"
    desired_output_point_count: int = 1000
    assumed_minimum_pointcloud_bbox: float = 10.0
    maximum_voxel_count_per_dimension: int = 100

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        mn, mx = pc.bounding_box()
        span = jnp.maximum(
            mx - mn, self.assumed_minimum_pointcloud_bbox
        )
        volume = jnp.prod(span)
        res = jnp.cbrt(volume / max(self.desired_output_point_count, 1))
        res = jnp.maximum(
            res, jnp.max(span) / self.maximum_voxel_count_per_dimension
        )
        # voxel size must be static for the sort; resolve on host via a tiny
        # sync (cheap: bbox of a fixed-capacity array) — rounded to 1 mm to
        # keep the jit cache stable across frames
        res_value = max(round(float(res), 3), 1e-3)
        inner = FilterDecimateVoxels(
            input_pointcloud_layer=(self.input_pointcloud_layer,),
            output_pointcloud_layer=self.output_pointcloud_layer,
            voxel_filter_resolution=res_value,
            decimate_method=DecimateMethod.FIRST_POINT,
        )
        return inner(layers, variables)
