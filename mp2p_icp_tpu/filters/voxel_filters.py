"""Voxel-occupancy-based filters: static/dynamic split and 2-D slices.

Reference parity:
- FilterRemoveByVoxelOccupancy (mp2p_icp_filters/src/
  FilterRemoveByVoxelOccupancy.cpp): split a point layer by the occupancy
  of a voxel-map layer — points in confidently-occupied voxels are static
  scene, points in carved (free) voxels are dynamic objects.
- FilterVoxelSlice (src/FilterVoxelSlice.cpp): extract a z-slice of a
  voxel map into a 2-D occupancy grid layer.
- GeneratorVoxelMap: the sm2mm 'metric_map_definition' CVoxelMap path
  (Generator.cpp:492+, demos/sm2mm_bonxai_voxelmap.yaml) — accumulates
  scans into a VoxelGridLayer with free-space carving (ops.voxel_occupancy).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import VoxelGridLayer
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact
from mp2p_icp_tpu.ops.voxel_occupancy import lookup_occupancy, update_voxel_map


@dataclasses.dataclass(frozen=True)
class FilterRemoveByVoxelOccupancy(FilterBase):
    """Params (reference: FilterRemoveByVoxelOccupancy.h:55-69)."""

    input_pointcloud_layer: str = "raw"
    input_voxel_layer: str = "voxelmap"
    output_layer_static_objects: Optional[str] = None
    output_layer_dynamic_objects: Optional[str] = None
    occupancy_threshold: float = 0.4

    def __call__(self, layers, variables=None):
        pc: PointCloud = layers[self.input_pointcloud_layer]
        vg: VoxelGridLayer = layers[self.input_voxel_layer]
        occ = lookup_occupancy(vg, pc.xyz)
        static = pc.valid_mask() & (occ > self.occupancy_threshold)
        out = dict(layers)
        if self.output_layer_static_objects:
            out[self.output_layer_static_objects] = compact(pc, static)
        if self.output_layer_dynamic_objects:
            out[self.output_layer_dynamic_objects] = compact(pc, ~static)
        return out


@dataclasses.dataclass(frozen=True)
class OccGrid2D:
    """Dense 2-D occupancy grid layer (reference: COccupancyGridMap2D)."""

    occupancy: jnp.ndarray  # [H, W] in [0, 1]
    origin_xy: tuple  # world coords of cell (0, 0)
    resolution: float


@dataclasses.dataclass(frozen=True)
class FilterVoxelSlice(FilterBase):
    """Params (reference: FilterVoxelSlice.h)."""

    input_layer: str = "voxelmap"
    output_layer: str = "gridmap"
    slice_z_min: float = 0.0
    slice_z_max: float = 1.0
    grid_half_extent: float = 50.0  # metres each side of origin

    def __call__(self, layers, variables=None):
        vg: VoxelGridLayer = layers[self.input_layer]
        res = vg.resolution
        n = int(round(2 * self.grid_half_extent / res))
        zc = vg.keys[:, 2].astype(jnp.float32) * res
        half_cells = n // 2
        gx = vg.keys[:, 0] + half_cells
        gy = vg.keys[:, 1] + half_cells
        # voxels outside the grid extent are DROPPED, not clamped onto the
        # border cells (clamping painted far-away occupancy on the edge)
        in_grid = (gx >= 0) & (gx < n) & (gy >= 0) & (gy < n)
        in_slice = (
            vg.valid & in_grid
            & (zc >= self.slice_z_min) & (zc < self.slice_z_max)
        )
        flat = jnp.where(
            in_slice, jnp.clip(gx, 0, n - 1) * n + jnp.clip(gy, 0, n - 1),
            n * n,
        )
        grid = (
            jnp.full((n * n + 1,), 0.5, jnp.float32)
            .at[flat]
            .max(jnp.where(in_slice, vg.occupancy, 0.5))
        )[: n * n].reshape(n, n)
        out = dict(layers)
        out[self.output_layer] = OccGrid2D(
            occupancy=grid,
            origin_xy=(-self.grid_half_extent, -self.grid_half_extent),
            resolution=res,
        )
        return out


@dataclasses.dataclass(frozen=True)
class GeneratorVoxelMap(FilterBase):
    """Accumulate a point layer into a voxel occupancy layer with
    free-space carving (the sm2mm Bonxai-voxelmap pipeline step)."""

    input_pointcloud_layer: str = "raw"
    output_voxel_layer: str = "voxelmap"
    resolution: float = 0.5
    capacity: int = 1 << 16
    ray_samples: int = 32
    carve_free_space: bool = True

    def __call__(self, layers, variables=None):
        pc: PointCloud = layers[self.input_pointcloud_layer]
        vg = layers.get(self.output_voxel_layer)
        if vg is None or not isinstance(vg, VoxelGridLayer):
            vg = VoxelGridLayer.empty(self.capacity, self.resolution)
        origin = jnp.zeros(3, jnp.float32)
        if variables:
            origin = jnp.asarray(
                [
                    variables.get("robot_x", 0.0),
                    variables.get("robot_y", 0.0),
                    variables.get("robot_z", 0.0),
                ],
                jnp.float32,
            )
        vg = update_voxel_map(
            vg,
            pc.xyz,
            pc.valid_mask(),
            origin,
            ray_samples=self.ray_samples,
            carve_free_space=self.carve_free_space,
        )
        out = dict(layers)
        out[self.output_voxel_layer] = vg
        return out
