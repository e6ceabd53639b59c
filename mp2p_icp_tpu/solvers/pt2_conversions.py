"""Convert pt2pl / pt2ln pairings into virtual pt2pt pairs for Horn/OLAE.

Reference parity: mp2p_icp/src/pt2ln_pl_to_pt2pt.cpp:25-113 — project the
(guess-transformed) local point onto its paired plane/line to synthesise a
virtual global point, then keep only pairs whose error is within a fraction
(`ratio = 0.25`) of the largest error ("the smallest ones are already
satisfied and may constrain the solution too much"), always keeping >= 3.

TPU-first: the reference's multimap sort-and-truncate becomes a masked
threshold: compute each block's max error with a masked reduction, zero the
weight of pairs below ``ratio * max_err`` (keeping at least min_keep via a
top-k style fallback handled by the threshold itself — if fewer than 3 pass,
we keep everything, a simplification that preserves the >=3 guarantee).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pairings import Pairings, PairsPt2Pt
from mp2p_icp_tpu.core.se3 import Pose

RATIO = 0.25
MIN_KEEP = 3


def pt2ln_pl_to_pt2pt(pairings: Pairings, guess: Pose) -> Pairings:
    """Returns a new Pairings whose pt2pt block is the original pt2pt pairs
    followed by the virtual pairs from pt2pl and pt2ln; pt2pl/pt2ln blocks
    are zeroed out."""
    blocks = [
        (pairings.pt2pt.local, pairings.pt2pt.globl, pairings.pt2pt.weight,
         pairings.pt2pt.local_idx, pairings.pt2pt.global_idx),
    ]

    # pt2pl -> closest point on plane
    s = pairings.pt2pl
    if s.capacity > 1:
        pt_g = se3.apply(guess, s.local)
        d = jnp.sum(s.plane_normal * (pt_g - s.plane_centroid), axis=-1)
        virtual_global = pt_g - s.plane_normal * d[:, None]
        w = _band_filter_weights(s.weight, jnp.abs(d))
        blocks.append((s.local, virtual_global, w, s.local_idx,
                       jnp.full_like(s.local_idx, -1)))

    # pt2ln -> closest point on line
    q = pairings.pt2ln
    if q.capacity > 1:
        pt_g = se3.apply(guess, q.local)
        rel = pt_g - q.line_point
        along = jnp.sum(q.line_dir * rel, axis=-1, keepdims=True)
        closest = q.line_point + q.line_dir * along
        d = jnp.linalg.norm(closest - pt_g, axis=-1)
        w = _band_filter_weights(q.weight, d)
        blocks.append((q.local, closest, w, q.local_idx,
                       jnp.full_like(q.local_idx, -1)))

    new_pt2pt = PairsPt2Pt(
        local=jnp.concatenate([b[0] for b in blocks], axis=0),
        globl=jnp.concatenate([b[1] for b in blocks], axis=0),
        weight=jnp.concatenate([b[2] for b in blocks], axis=0),
        local_idx=jnp.concatenate([b[3] for b in blocks], axis=0),
        global_idx=jnp.concatenate([b[4] for b in blocks], axis=0),
    )
    return dataclasses.replace(
        pairings,
        pt2pt=new_pt2pt,
        pt2ln=type(pairings.pt2ln).empty(1),
        pt2pl=type(pairings.pt2pl).empty(1),
    )


def _band_filter_weights(weight: jnp.ndarray, err: jnp.ndarray) -> jnp.ndarray:
    """Keep pairs with err >= RATIO * max_err (reference heuristic); if that
    leaves < MIN_KEEP pairs, keep all valid pairs instead."""
    valid = weight > 0
    max_err = jnp.max(jnp.where(valid, err, -jnp.inf))
    keep = valid & (err >= RATIO * jnp.maximum(max_err, 0.0))
    enough = jnp.sum(keep.astype(jnp.int32)) >= MIN_KEEP
    final = jnp.where(enough, keep, valid)
    return weight * final
