"""Unified correspondence containers.

TPU-native replacement for the reference's ``mp2p_icp::Pairings``
(reference: mp2p_icp/include/mp2p_icp/Pairings.h:84-200): five pairing types
(pt2pt, pt2ln, pt2pl, ln2ln, pl2pl), potential-pairing bookkeeping, and
per-block weights.

Design: each block is a fixed-capacity masked SoA tensor set. Geometry is
stored directly (gathered at match time) rather than as indices, so solver
kernels never re-gather. Invalid rows carry zero weight — every downstream
reduction is a masked weighted sum, which maps to single fused XLA
reductions instead of the reference's per-pair scalar loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairsPt2Pt:
    """Point-to-point pairs (reference: paired_pt2pt, mrpt TMatchingPairList)."""

    local: jax.Array  # [C, 3] local point (sensor frame)
    globl: jax.Array  # [C, 3] paired global point
    weight: jax.Array  # [C] (0 for invalid rows)
    local_idx: jax.Array  # [C] i32 index into the local layer (-1 invalid)
    global_idx: jax.Array  # [C] i32 index into the global layer (-1 invalid)

    @property
    def capacity(self) -> int:
        return self.weight.shape[0]

    def valid(self) -> jax.Array:
        return self.weight > 0

    def count(self) -> jax.Array:
        return jnp.sum(self.valid().astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PairsPt2Pt":
        return PairsPt2Pt(
            local=jnp.zeros((capacity, 3), jnp.float32),
            globl=jnp.zeros((capacity, 3), jnp.float32),
            weight=jnp.zeros((capacity,), jnp.float32),
            local_idx=jnp.full((capacity,), -1, jnp.int32),
            global_idx=jnp.full((capacity,), -1, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairsPt2Pl:
    """Point-to-plane pairs (reference: point_plane_pair_t)."""

    local: jax.Array  # [C, 3]
    plane_centroid: jax.Array  # [C, 3]
    plane_normal: jax.Array  # [C, 3] unit
    weight: jax.Array  # [C]
    local_idx: jax.Array  # [C] i32

    @property
    def capacity(self) -> int:
        return self.weight.shape[0]

    def valid(self) -> jax.Array:
        return self.weight > 0

    def count(self) -> jax.Array:
        return jnp.sum(self.valid().astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PairsPt2Pl":
        return PairsPt2Pl(
            local=jnp.zeros((capacity, 3), jnp.float32),
            plane_centroid=jnp.zeros((capacity, 3), jnp.float32),
            plane_normal=jnp.zeros((capacity, 3), jnp.float32),
            weight=jnp.zeros((capacity,), jnp.float32),
            local_idx=jnp.full((capacity,), -1, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairsPt2Ln:
    """Point-to-line pairs (reference: point_line_pair_t)."""

    local: jax.Array  # [C, 3]
    line_point: jax.Array  # [C, 3]
    line_dir: jax.Array  # [C, 3] unit
    weight: jax.Array  # [C]
    local_idx: jax.Array  # [C] i32

    @property
    def capacity(self) -> int:
        return self.weight.shape[0]

    def valid(self) -> jax.Array:
        return self.weight > 0

    def count(self) -> jax.Array:
        return jnp.sum(self.valid().astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PairsPt2Ln":
        return PairsPt2Ln(
            local=jnp.zeros((capacity, 3), jnp.float32),
            line_point=jnp.zeros((capacity, 3), jnp.float32),
            line_dir=jnp.zeros((capacity, 3), jnp.float32),
            weight=jnp.zeros((capacity,), jnp.float32),
            local_idx=jnp.full((capacity,), -1, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairsLn2Ln:
    """Line-to-line pairs (reference: matched_line_t)."""

    local_point: jax.Array  # [C, 3]
    local_dir: jax.Array  # [C, 3]
    global_point: jax.Array  # [C, 3]
    global_dir: jax.Array  # [C, 3]
    weight: jax.Array  # [C]

    @property
    def capacity(self) -> int:
        return self.weight.shape[0]

    def valid(self) -> jax.Array:
        return self.weight > 0

    def count(self) -> jax.Array:
        return jnp.sum(self.valid().astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PairsLn2Ln":
        z = jnp.zeros((capacity, 3), jnp.float32)
        return PairsLn2Ln(z, z, z, z, jnp.zeros((capacity,), jnp.float32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairsPl2Pl:
    """Plane-to-plane pairs (reference: matched_plane_t)."""

    local_normal: jax.Array  # [C, 3]
    local_centroid: jax.Array  # [C, 3]
    global_normal: jax.Array  # [C, 3]
    global_centroid: jax.Array  # [C, 3]
    weight: jax.Array  # [C]

    @property
    def capacity(self) -> int:
        return self.weight.shape[0]

    def valid(self) -> jax.Array:
        return self.weight > 0

    def count(self) -> jax.Array:
        return jnp.sum(self.valid().astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "PairsPl2Pl":
        z = jnp.zeros((capacity, 3), jnp.float32)
        return PairsPl2Pl(z, z, z, z, jnp.zeros((capacity,), jnp.float32))


def _decimate_block(block, capacity: int):
    """Stride-decimate a pairing block's valid rows to <= capacity and
    compact them to the front (same even-stride trick as the large-map
    crop: plain truncation would bias toward low local indices)."""
    if block.capacity <= capacity:
        return block
    valid = block.valid()
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    total = jnp.sum(valid.astype(jnp.int32))
    stride = jnp.maximum((total + capacity - 1) // capacity, 1)
    keep = valid & (rank % stride == 0)
    # stable argsort(~keep): kept rows first, original order preserved
    order = jnp.argsort(~keep)[:capacity]
    cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)
    live = jnp.arange(capacity) < cnt
    out = {}
    for f in dataclasses.fields(block):
        a = getattr(block, f.name)[order]
        fill = -1 if jnp.issubdtype(a.dtype, jnp.integer) else 0
        mask = live if a.ndim == 1 else live[:, None]
        out[f.name] = jnp.where(mask, a, jnp.asarray(fill, a.dtype))
    return type(block)(**out)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pairings:
    """The unified correspondence set handed from matchers to solvers
    (reference: Pairings.h:84-200)."""

    pt2pt: PairsPt2Pt
    pt2ln: PairsPt2Ln
    pt2pl: PairsPt2Pl
    ln2ln: PairsLn2Ln
    pl2pl: PairsPl2Pl
    # reference: potential_pairings counter used by QualityEvaluator_PairedRatio
    potential_pairings: jax.Array  # scalar i32

    @staticmethod
    def empty(
        pt2pt_cap: int = 0,
        pt2ln_cap: int = 0,
        pt2pl_cap: int = 0,
        ln2ln_cap: int = 8,
        pl2pl_cap: int = 8,
    ) -> "Pairings":
        return Pairings(
            pt2pt=PairsPt2Pt.empty(max(pt2pt_cap, 1)),
            pt2ln=PairsPt2Ln.empty(max(pt2ln_cap, 1)),
            pt2pl=PairsPt2Pl.empty(max(pt2pl_cap, 1)),
            ln2ln=PairsLn2Ln.empty(max(ln2ln_cap, 1)),
            pl2pl=PairsPl2Pl.empty(max(pl2pl_cap, 1)),
            potential_pairings=jnp.asarray(0, jnp.int32),
        )

    def size(self) -> jax.Array:
        """Total number of valid pairings (reference: Pairings::size())."""
        return (
            self.pt2pt.count()
            + self.pt2ln.count()
            + self.pt2pl.count()
            + self.ln2ln.count()
            + self.pl2pl.count()
        )

    def decimated(self, capacity: int) -> "Pairings":
        """Evenly-strided subset of the valid pairs of every block, each
        compacted to ``capacity`` rows — the capacity-bounded per-iteration
        pairing record for LogRecord playback (reference keeps the FULL
        Pairings per iteration, LogRecord.h:58-71; on TPU a bounded record
        keeps the recording scan's memory static and small)."""
        return Pairings(
            pt2pt=_decimate_block(self.pt2pt, capacity),
            pt2ln=_decimate_block(self.pt2ln, capacity),
            pt2pl=_decimate_block(self.pt2pl, capacity),
            ln2ln=_decimate_block(self.ln2ln, capacity),
            pl2pl=_decimate_block(self.pl2pl, capacity),
            potential_pairings=self.potential_pairings,
        )

    def empty_flag(self) -> jax.Array:
        return self.size() == 0
