"""Horn's closed-form quaternion solution for the optimal SE(3) transform.

Reference parity: mp2p_icp/src/optimal_tf_horn.cpp:77-252 — weighted
cross-covariance S = sum w r bT over centred/attitude vector pairs, the
standard symmetric 4x4 N matrix, rotation = eigenvector of the largest
eigenvalue, translation from centroids.

TPU-first: S is one masked einsum reduction; the 4x4 eigenproblem is solved
by a fixed-iteration shifted power method (branch-free, jit/vmap-safe — no
LAPACK) which converges far beyond f32 precision in <=30 iterations.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.solvers.common import (
    VectorPairs,
    WeightParameters,
    build_vector_pairs,
    translation_from_centroids,
)


def _horn_n_matrix(S: jax.Array) -> jax.Array:
    """The 4x4 symmetric N matrix of Horn's method from S = sum w r bT."""
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    return jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )


def max_eigvec_4x4(N: jax.Array, iters: int = 30) -> jax.Array:
    """Dominant eigenvector of a symmetric 4x4 via shifted power iteration.
    Shift by the Gershgorin bound so all eigenvalues become non-negative and
    the algebraically-largest dominates. Deterministic start vector with a
    tiny symmetric-breaking ramp."""
    shift = jnp.max(jnp.sum(jnp.abs(N), axis=1))
    A = N + shift * jnp.eye(4, dtype=N.dtype)
    v0 = jnp.array([1.0, 1e-3, 2e-3, 3e-3], dtype=N.dtype)

    def body(_, v):
        v = A @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v0 / jnp.linalg.norm(v0))
    # canonical sign: q_w >= 0 (reference: optimal_tf_horn.cpp:166-173)
    return v * jnp.sign(v[0] + 1e-30)


def horn_from_vector_pairs(vp: VectorPairs) -> Pose:
    """Rotation+translation from assembled weighted vector pairs.
    Degenerate input (all weights zero) yields the identity pose — the
    reference instead returns false from the solver (optimal_tf_horn.cpp:96);
    the ICP loop's NoPairings termination fires before that can matter."""
    w_total = jnp.sum(vp.w)
    w_sum = jnp.maximum(w_total, 1e-30)
    S = jnp.einsum("c,ci,cj->ij", vp.w / w_sum, vp.r, vp.b)
    q = max_eigvec_4x4(_horn_n_matrix(S))
    R = se3.quat_to_rot(q)
    t = translation_from_centroids(R, vp.ct_local, vp.ct_global)
    ok = w_total > 0
    return Pose(
        jnp.where(ok, R, jnp.eye(3, dtype=R.dtype)),
        jnp.where(ok, t, jnp.zeros_like(t)),
    )


def horn_scale(
    pairings: Pairings,
    wp: Optional[WeightParameters] = None,
) -> jax.Array:
    """Optimal uniform scale ``s`` with global ≈ s·R·local + t.

    Reference parity: optimal_tf_horn.cpp:177-195 — Horn's symmetric scale
    expression sqrt(Σ|·|²/Σ|·|²) over the centred vector pairs (the
    reference keeps it behind ``#if 0``/``forceScaleToUnity`` but still
    reserves Results.h:35-36 ``optimalScale`` for it). Convention: the
    returned scale maps LOCAL onto GLOBAL (s = sqrt(Σw|b|²/Σw|r|²), b =
    centred global, r = centred local) so that the translation composition
    ``t = ct_global - s·R·ct_local`` (the "pp *= s" at
    optimal_tf_horn.cpp:243) is consistent; the dead code's num/den order
    is the reciprocal of this.

    Weighted with the same masked weights as the rotation solve; degenerate
    input (no pairs) yields 1.0."""
    wp = wp or WeightParameters()
    vp = build_vector_pairs(pairings, wp, normalize_point_vectors=False)
    num = jnp.sum(vp.w * jnp.sum(vp.b * vp.b, axis=-1))
    den = jnp.sum(vp.w * jnp.sum(vp.r * vp.r, axis=-1))
    ok = (num > 0) & (den > 0)
    return jnp.where(ok, jnp.sqrt(num / jnp.maximum(den, 1e-30)), 1.0)


def optimal_tf_horn(
    pairings: Pairings,
    wp: Optional[WeightParameters] = None,
    current_estimate: Optional[Pose] = None,
) -> Pose:
    """Full Horn solve from raw pairings (pt2pt + ln2ln + pl2pl attitude
    terms; pt2ln/pt2pl must be pre-converted — see solvers.pt2_conversions,
    mirroring the reference's Solver_Horn + pt2ln_pl_to_pt2pt)."""
    wp = wp or WeightParameters()
    vp = build_vector_pairs(
        pairings, wp, normalize_point_vectors=False, current_estimate=current_estimate
    )
    return horn_from_vector_pairs(vp)
