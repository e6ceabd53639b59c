"""Matcher base machinery.

Reference parity: mp2p_icp/include/mp2p_icp/Matcher.h:36-124 (gating by
enabled/iteration window, MatchContext, MatchState with paired bitfields)
and Matcher_Points_Base.h:39-128 (per-layer-pair weight table, local
subsampling, local->global transform).

TPU-first redesign:
- A matcher is a frozen config object whose ``match()`` is a pure traced
  function; iteration gating multiplies the output weights by a traced
  0/1 factor instead of branching (so the jitted ICP loop stays static).
- The paired "bitfields" (reference: pointcloud_bitfield.h) are boolean
  mask arrays per layer inside ``MatchState`` — updated functionally.
- Each matcher emits a fixed-capacity pairing block per configured layer
  pair; the ICP engine concatenates blocks (the reference appends to
  shared vectors sequentially).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.ops.voxel_hash import HashGrid


@dataclasses.dataclass(frozen=True)
class LayerMatch:
    """One entry of ``pointLayerMatches`` (reference:
    Matcher_Points_Base.h pointLayerMatches weight table)."""

    global_layer: str = "raw"
    local_layer: str = "raw"
    weight: float = 1.0


def point_layers(m) -> Dict[str, PointCloud]:
    """Accept either a MetricMap (host container) or a plain dict of layers
    (the pytree form passed through jit) and return point layers only."""
    if isinstance(m, MetricMap):
        return {
            k: v for k, v in m.layers.items() if isinstance(v, PointCloud)
        }
    return m


class MatchState(NamedTuple):
    """Functional replacement of the reference MatchState bitfields:
    per-layer boolean "already paired" masks."""

    local_paired: Dict[str, jax.Array]
    global_paired: Dict[str, jax.Array]

    @staticmethod
    def create(local_map, global_map, global_scale: int = 1) -> "MatchState":
        """global_scale > 1: inside a spatially-sharded align (shard_map)
        the global layers seen here are single SHARDS, but paired bitfields
        must span GLOBAL ids (shard * capacity + local) — so the global
        masks are sized capacity * num_shards and, being derived from the
        replicated post-all_gather NN results, stay identical on every
        device."""
        lp = {
            name: jnp.zeros((layer.capacity,), bool)
            for name, layer in point_layers(local_map).items()
        }
        gp = {
            name: jnp.zeros((layer.capacity * global_scale,), bool)
            for name, layer in point_layers(global_map).items()
        }
        return MatchState(local_paired=lp, global_paired=gp)


class MatchContext(NamedTuple):
    """Reference: MatchContext{icpIteration} (Matcher.h:60-66)."""

    icp_iteration: jax.Array  # traced scalar i32
    # per-global-layer cropped-index -> ORIGINAL-map-index tables
    # ([crop_capacity] i32, -1 for padding), set by ICP._align_full when
    # _crop_globals compacted a layer: matchers translate the global_idx
    # they RECORD in Pairings through this, so log/results consumers see
    # the user's own map indices (internal masks keep cropped ids)
    global_index_maps: Optional[dict] = None


@dataclasses.dataclass(frozen=True)
class Matcher:
    """Common gating params (reference: Matcher.h:90-112)."""

    enabled: bool = True
    run_from_iteration: int = 0
    run_up_to_iteration: int = 0  # 0 = no upper bound

    def gate(self, iteration: jax.Array) -> jax.Array:
        """Traced 0/1 factor for this ICP iteration (reference:
        Matcher::match() gating, Matcher.cpp:46-60)."""
        on = jnp.asarray(self.enabled)
        on = on & (iteration >= self.run_from_iteration)
        if self.run_up_to_iteration > 0:
            on = on & (iteration <= self.run_up_to_iteration)
        return on.astype(jnp.float32)

    # subclasses implement:
    # def match(self, grids, global_map, local_map, pose, state, ctx)
    #     -> (pairing blocks, new MatchState, potential_pairings)


def subsample_mask(valid: jax.Array, count: jax.Array, max_points: int) -> jax.Array:
    """Deterministic even-stride subsampling of valid points down to
    ``max_points`` (reference uses seeded random subsampling,
    Matcher_Points_Base.cpp:221-245; with unordered clouds an even stride
    is statistically equivalent and reproducible on TPU)."""
    if max_points <= 0:
        return valid
    C = valid.shape[0]
    idx = jnp.arange(C, dtype=jnp.float32)
    stride = jnp.maximum(count.astype(jnp.float32) / float(max_points), 1.0)
    # keep points whose index crosses a stride boundary
    keep = jnp.floor(idx / stride) != jnp.floor((idx - 1) / stride)
    keep = keep.at[0].set(True)
    return valid & keep


def transformed_local(
    local: PointCloud, pose: Pose
) -> Tuple[jax.Array, jax.Array]:
    """Local points mapped into the global frame + validity (reference:
    Matcher_Points_Base::transform_local_to_global).

    Padding rows transform to garbage-but-huge coordinates and are masked by
    `valid` downstream — no [C, 3] where here (standalone small-minor-dim
    ops cost ~1 ms on this TPU; see ops.nn_bruteforce layout note)."""
    from mp2p_icp_tpu.core import se3

    pts = se3.apply(pose, local.xyz)
    return pts, local.valid_mask()


GridCache = Dict[str, HashGrid]
