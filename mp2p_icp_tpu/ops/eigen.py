"""Masked mean/covariance + eigen decomposition of point subsets.

TPU-native replacement for the reference's ``estimate_points_eigen()``
(reference: mp2p_icp_map/include/mp2p_icp/estimate_points_eigen.h:40-68) —
the basis of line/plane fitting in Matcher_Point2Line, Matcher_Adaptive and
FilterEdgesPlanes.

Here the routine is fully batched: ``masked_eigen`` takes ``[..., K, 3]``
neighbourhoods with ``[..., K]`` masks and returns sorted eigenpairs for all
of them in one fused computation. The 3x3 symmetric eigendecomposition is
closed-form (trigonometric method) — no LAPACK, no per-point host loops,
vectorises perfectly on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


class PointsEigen(NamedTuple):
    """Sorted eigen-structure of a point neighbourhood.
    eigenvalues ascending: [..., 3] (λ0 <= λ1 <= λ2);
    eigenvectors[..., :, i] is the unit eigenvector for λi."""

    mean: jax.Array  # [..., 3]
    eigenvalues: jax.Array  # [..., 3]
    eigenvectors: jax.Array  # [..., 3, 3]
    count: jax.Array  # [...]


def masked_mean_cov(points: jax.Array, mask: jax.Array):
    """Weighted mean and covariance over the masked K axis.

    points: [..., K, 3]; mask: [..., K] (bool or float weights).
    Returns (mean [..., 3], cov [..., 3, 3], count [...])."""
    w = mask.astype(points.dtype)
    n = jnp.sum(w, axis=-1)
    n_safe = jnp.maximum(n, 1.0)
    mean = jnp.sum(points * w[..., None], axis=-2) / n_safe[..., None]
    centered = points - mean[..., None, :]
    # weight ONE factor of the outer product: cov = sum w (p-m)(p-m)^T / sum w
    # (weighting both factors would square float weights; bool masks are
    # unaffected since w^2 == w there)
    cov = jnp.einsum(
        "...k,...ki,...kj->...ij", w, centered, centered
    ) / n_safe[..., None, None]
    return mean, cov, n


def eigh3x3(A: jax.Array):
    """Closed-form symmetric 3x3 eigendecomposition, batched.

    Uses the trigonometric (Cardano) method for eigenvalues and cross-product
    construction for eigenvectors. Returns (eigenvalues ascending [..., 3],
    eigenvectors [..., 3, 3] column-major per eigenvalue). Robust to repeated
    eigenvalues via candidate-column selection.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p * p * p, _EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: descending order via phi, phi + 2π/3, phi + 4π/3
    two_pi_3 = 2.0943951023931953
    l2 = q + 2.0 * p * jnp.cos(phi)
    l0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    l1 = 3.0 * q - l0 - l2
    evals = jnp.stack([l0, l1, l2], axis=-1)  # ascending

    def eigvec(lam):
        # (A - λI) has rank <= 2; its two independent rows cross to the
        # eigenvector. Pick the largest-norm cross product of row pairs.
        M = A - lam[..., None, None] * eye
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        cands = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3, 3]
        norms = jnp.linalg.norm(cands, axis=-1)
        best = jnp.argmax(norms, axis=-1)
        v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)
        v = v.squeeze(-2)
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        # Doubly-degenerate eigenvalue: rank(M) <= 1, all row crosses vanish.
        # The eigenspace is then the plane orthogonal to the largest row r;
        # pick any unit vector in it (cross r with a non-parallel axis).
        rows = jnp.stack([r0, r1, r2], axis=-2)
        rnorms = jnp.linalg.norm(rows, axis=-1)
        rbest = jnp.argmax(rnorms, axis=-1)
        r = jnp.take_along_axis(rows, rbest[..., None, None].repeat(3, -1), -2)
        r = r.squeeze(-2)
        ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), r.shape)
        ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], A.dtype), r.shape)
        perp = jnp.cross(r, ex)
        perp_n = jnp.linalg.norm(perp, axis=-1, keepdims=True)
        perp = jnp.where(perp_n > 1e-12, perp, jnp.cross(r, ey))
        perp = perp / jnp.maximum(
            jnp.linalg.norm(perp, axis=-1, keepdims=True), _EPS
        )
        # Fully isotropic (M ~ 0): any vector is an eigenvector -> e_x.
        fallback = jnp.where(
            (rnorms.max(axis=-1) > 1e-12)[..., None], perp, ex
        )
        return jnp.where(n > 1e-10, v / jnp.maximum(n, _EPS), fallback)

    v0 = eigvec(l0)
    v2 = eigvec(l2)
    # Orthogonalise: v2 against v0, v1 = v2 x v0 (right-handed, exact)
    v2 = v2 - jnp.sum(v2 * v0, -1, keepdims=True) * v0
    n2 = jnp.linalg.norm(v2, axis=-1, keepdims=True)
    # if v2 degenerate (isotropic), pick any orthogonal to v0
    alt = jnp.cross(v0, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v0.shape))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v0, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], A.dtype), v0.shape))
    alt = jnp.where(alt_n > 1e-6, alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), _EPS)
    v2 = jnp.where(n2 > 1e-10, v2 / jnp.maximum(n2, _EPS), alt)
    v1 = jnp.cross(v2, v0)
    evecs = jnp.stack([v0, v1, v2], axis=-1)  # columns = eigenvectors
    return evals, evecs


def estimate_points_eigen(points: jax.Array, mask: jax.Array) -> PointsEigen:
    """Batched equivalent of the reference's estimate_points_eigen():
    mean/cov + sorted eigendecomposition of each masked neighbourhood."""
    mean, cov, n = masked_mean_cov(points, mask)
    evals, evecs = eigh3x3(cov)
    return PointsEigen(mean=mean, eigenvalues=evals, eigenvectors=evecs, count=n)
