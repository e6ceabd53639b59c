"""Shared machinery for the closed-form solvers (Horn / OLAE).

Reference parity: mp2p_icp/src/visit_correspondences.h:38-221 (the unified
vector-pair visitor) and Pairings::eval_centroids_robust. The reference
iterates pairs with lambdas; here the same semantics are a handful of masked
vectorised reductions:

- pt2pt pairs become centroid-centred vector pairs (normalised for OLAE);
- ln2ln directions and pl2pl normals join as unit "attitude" vector pairs;
- per-type attitude weights are count-normalised exactly like the reference
  (w_type / (w_pt*N_pt + w_ln*N_ln + w_pl*N_pl), visit_correspondences.h:74-84);
- the scale-based outlier detector zeroes weights where
  max(|b|,|r|)/min(|b|,|r|) > threshold (visit_correspondences.h:153-164);
- near-centroid degenerate points (<1e-4) are dropped (:136-141);
- optional robust kernel re-weighting vs a current estimate (:195-204) —
  applied to *rotated* centred vectors (rotation only; the reference applies
  the full pose including translation to centred vectors, which we consider
  a bug and deviate from — kernels are off by default in both).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.solvers.robust import RobustKernel, robust_sqrt_weight


@dataclasses.dataclass(frozen=True)
class PairWeights:
    """Per-type weights (reference: PairWeights.h:35-52, defaults 1.0)."""

    pt2pt: float = 1.0
    pt2ln: float = 1.0
    pt2pl: float = 1.0
    ln2ln: float = 1.0
    pl2pl: float = 1.0


@dataclasses.dataclass(frozen=True)
class WeightParameters:
    """Reference: WeightParameters.h:34-70."""

    use_scale_outlier_detector: bool = False
    scale_outlier_threshold: float = 1.20
    pair_weights: PairWeights = dataclasses.field(default_factory=PairWeights)
    robust_kernel: RobustKernel = RobustKernel.NONE
    robust_kernel_param: float = 1.0


class VectorPairs(NamedTuple):
    """Unified weighted vector-pair form consumed by Horn and OLAE.
    b = global-side vectors, r = local-side vectors, w >= 0 (0 = masked)."""

    b: jax.Array  # [C, 3]
    r: jax.Array  # [C, 3]
    w: jax.Array  # [C]
    ct_local: jax.Array  # [3]
    ct_global: jax.Array  # [3]


def eval_centroids(p: Pairings, extra_mask: Optional[jax.Array] = None):
    """Weight-masked centroids of the pt2pt block (reference:
    Pairings::eval_centroids_robust, Pairings.cpp)."""
    w = (p.pt2pt.weight > 0).astype(jnp.float32)
    if extra_mask is not None:
        w = w * extra_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    ct_local = jnp.sum(p.pt2pt.local * w[:, None], axis=0) / n
    ct_global = jnp.sum(p.pt2pt.globl * w[:, None], axis=0) / n
    return ct_local, ct_global


def _assemble(
    p: Pairings,
    wp: WeightParameters,
    ct_local: jax.Array,
    ct_global: jax.Array,
    normalize_point_vectors: bool,
    current_estimate: Optional[Pose],
):
    """One pass of visit_correspondences: returns (VectorPairs, scale_inlier
    mask over the pt2pt block)."""
    pw = wp.pair_weights
    n_pt = p.pt2pt.count().astype(jnp.float32)
    n_ln = p.ln2ln.count().astype(jnp.float32)
    n_pl = p.pl2pl.count().astype(jnp.float32)
    denom = jnp.maximum(pw.pt2pt * n_pt + pw.ln2ln * n_ln + pw.pl2pl * n_pl, 1e-30)
    wa_pt = pw.pt2pt / denom
    wa_ln = pw.ln2ln / denom
    wa_pl = pw.pl2pl / denom

    # --- pt2pt: centred (optionally normalised) vectors
    b = p.pt2pt.globl - ct_global
    r = p.pt2pt.local - ct_local
    bn = jnp.linalg.norm(b, axis=-1)
    rn = jnp.linalg.norm(r, axis=-1)
    near_centroid = (bn < 1e-4) | (rn < 1e-4)
    w_pt = p.pt2pt.weight * wa_pt * (~near_centroid)
    scale_inlier = jnp.ones_like(bn, dtype=bool)
    if wp.use_scale_outlier_detector:
        ratio = jnp.maximum(bn, rn) / jnp.maximum(jnp.minimum(bn, rn), 1e-12)
        scale_inlier = ratio <= wp.scale_outlier_threshold
        w_pt = w_pt * scale_inlier
    if normalize_point_vectors:
        b = b / jnp.maximum(bn, 1e-12)[:, None]
        r = r / jnp.maximum(rn, 1e-12)[:, None]

    # --- ln2ln directions and pl2pl normals as attitude pairs
    b_ln, r_ln = p.ln2ln.global_dir, p.ln2ln.local_dir
    w_ln = (p.ln2ln.weight > 0).astype(jnp.float32) * wa_ln
    b_pl, r_pl = p.pl2pl.global_normal, p.pl2pl.local_normal
    w_pl = (p.pl2pl.weight > 0).astype(jnp.float32) * wa_pl

    all_b = jnp.concatenate([b, b_ln, b_pl], axis=0)
    all_r = jnp.concatenate([r, r_ln, r_pl], axis=0)
    all_w = jnp.concatenate([w_pt, w_ln, w_pl], axis=0)

    if wp.robust_kernel != RobustKernel.NONE:
        if current_estimate is None:
            raise ValueError("robust kernel requires a current pose estimate")
        r_rot = all_r @ current_estimate.R.T
        err_sqr = jnp.sum(jnp.square(r_rot - all_b), axis=-1)
        all_w = all_w * robust_sqrt_weight(
            wp.robust_kernel, err_sqr, wp.robust_kernel_param
        )

    return (
        VectorPairs(b=all_b, r=all_r, w=all_w, ct_local=ct_local, ct_global=ct_global),
        scale_inlier,
    )


def build_vector_pairs(
    p: Pairings,
    wp: WeightParameters,
    normalize_point_vectors: bool,
    current_estimate: Optional[Pose] = None,
) -> VectorPairs:
    """Full visit_correspondences equivalent, including the reference's
    two-pass centroid re-evaluation when the scale outlier detector fires
    (optimal_tf_horn.cpp:222-234 / optimal_tf_olae.cpp:271-283): a second
    pass recomputes centroids excluding detected outliers. On TPU we simply
    always run the second pass when the detector is on — deterministic
    control flow, negligible cost (two fused reductions)."""
    ct_local, ct_global = eval_centroids(p)
    vp, inliers = _assemble(
        p, wp, ct_local, ct_global, normalize_point_vectors, current_estimate
    )
    if wp.use_scale_outlier_detector:
        ct_local2, ct_global2 = eval_centroids(p, extra_mask=inliers)
        vp, _ = _assemble(
            p, wp, ct_local2, ct_global2, normalize_point_vectors, current_estimate
        )
    return vp


def translation_from_centroids(R: jax.Array, ct_local, ct_global) -> jax.Array:
    """t = ct_global - R ct_local (reference: optimal_tf_horn.cpp:240-247)."""
    return ct_global - R @ ct_local
