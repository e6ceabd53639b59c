"""Grid-based vertical-structure (pole) detector.

Reference parity: mp2p_icp_filters/src/FilterPoleDetector.cpp:60-224 —
2-D grid of cell z-statistics; a cell is a pole candidate when it has
>= ``minimum_pole_points`` and its mean z exceeds the mean z of at least
``minimum_neighbors_checks_to_pass`` of its 8 neighbours by between
``minimum_relative_height`` and ``maximum_relative_height``. Member points
go to ``output_layer_poles`` / ``output_layer_no_poles``.

TPU-first: the 2-D cell statistics come from one flatten-z voxel sort; the
8-neighbour mean comparison is a batched lookup over a small dense local
hash (2-D cells packed to one int key, matched by sorted search).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.filters.common import compact

_OFF = 1 << 14
_SENT = 2147483647  # i32 max (plain int: no jnp at import — see voxel_hash note)


@dataclasses.dataclass(frozen=True)
class FilterPoleDetector(FilterBase):
    """Params (reference: FilterPoleDetector.h:53-67, defaults preserved)."""

    input_pointcloud_layer: str = "raw"
    output_layer_poles: Optional[str] = None
    output_layer_no_poles: Optional[str] = None
    grid_size: float = 2.0
    minimum_relative_height: float = 2.5
    maximum_relative_height: float = 25.0
    minimum_pole_points: int = 5
    minimum_neighbors_checks_to_pass: int = 3

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        if not (self.output_layer_poles or self.output_layer_no_poles):
            raise ValueError(
                "FilterPoleDetector: need at least one output layer"
            )
        pc = layers[self.input_pointcloud_layer]
        C = pc.capacity
        valid = pc.valid_mask()
        cells = jnp.floor(pc.xyz[:, :2] / self.grid_size).astype(jnp.int32)
        key = (
            jnp.clip(cells[:, 0] + _OFF, 0, 2 * _OFF - 1) * (1 << 15)
            + jnp.clip(cells[:, 1] + _OFF, 0, 2 * _OFF - 1)
        )
        key = jnp.where(valid, key, _SENT)
        idx = jnp.arange(C, dtype=jnp.int32)
        ks, order = jax.lax.sort((key, idx), num_keys=1)
        z_s = pc.xyz[order, 2]
        valid_s = ks != _SENT
        new = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        seg = jnp.cumsum(new.astype(jnp.int32)) - 1
        w = valid_s.astype(jnp.float32)
        cnt = jax.ops.segment_sum(w, seg, num_segments=C)
        sum_z = jax.ops.segment_sum(z_s * w, seg, num_segments=C)
        mean_z = sum_z / jnp.maximum(cnt, 1.0)
        cell_key = jax.ops.segment_min(ks, seg, num_segments=C)
        n_cells = jnp.sum((new & valid_s).astype(jnp.int32))

        # 8-neighbour lookup: cell keys are sorted ascending (first n_cells
        # rows); searchsorted per neighbour offset
        def neighbor_mean(dx, dy):
            nk = cell_key + dx * (1 << 15) + dy
            pos = jnp.searchsorted(cell_key, nk)
            pos = jnp.clip(pos, 0, C - 1)
            found = (cell_key[pos] == nk) & (pos < n_cells)
            return jnp.where(found, mean_z[pos], 0.0), found

        checks = jnp.zeros((C,), jnp.int32)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nm, found = neighbor_mean(dx, dy)
                ok = (
                    found
                    & (mean_z > nm + self.minimum_relative_height)
                    & (mean_z < nm + self.maximum_relative_height)
                )
                checks = checks + ok.astype(jnp.int32)

        is_pole_cell = (cnt >= self.minimum_pole_points) & (
            checks >= self.minimum_neighbors_checks_to_pass
        )
        # back to per-point mask (original order)
        pole_sorted = valid_s & is_pole_cell[seg]
        pole_mask = jnp.zeros((C,), bool).at[order].set(pole_sorted)

        out = dict(layers)
        if self.output_layer_poles:
            out[self.output_layer_poles] = compact(pc, pole_mask)
        if self.output_layer_no_poles:
            out[self.output_layer_no_poles] = compact(pc, ~pole_mask)
        return out
