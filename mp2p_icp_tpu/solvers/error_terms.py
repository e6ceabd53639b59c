"""Residuals + analytic Jacobians for the five MP2P pairing types.

Reference parity: mp2p_icp/src/errorTerms.cpp (error_point2point :36-66,
error_point2line :68-113, error_point2plane :115-161, error_line2line
:163-326, error_plane2plane :328-363).

TPU-first redesign: instead of the reference's per-pair 3x12 Jacobians in the
flattened-affine parameterisation chained with ``jacob_dDexpe_de`` (12x6),
we differentiate directly w.r.t. a *right* se(3) perturbation
``T' = T ∘ exp(eps)``, tangent ordering ``[rho(3), theta(3)]``:

    d(T(l))/d eps = [ R | -R hat(l) ]        (3x6)

Every function is batched over the pairing capacity axis and returns
``(residual [C, D], jacobian [C, D, 6])`` so the Gauss-Newton H/g build is a
single masked einsum reduction (the reference's TBB parallel_reduce sites,
optimal_tf_gauss_newton.cpp:77-145, become one fused XLA reduction).

The ln2ln residual is redesigned (documented divergence): the reference uses
a 4-dim error with a parallel/general branch split (errorTerms.cpp:163-326)
that is branchy and scale-inconsistent; we use the branch-free 6-dim
  [ (I - u_g u_gT)(T(p_l) - p_g) ;  (R u_l) x u_g ]
(point-off-line + direction misalignment), which has the same zero set.

Analytic Jacobians are verified against jax autodiff in
tests/test_error_terms.py (the reference's test category 1,
tests/test-mp2p_error_terms_jacobians.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.se3 import Pose


def _point_jacobian(pose: Pose, local: jax.Array) -> jax.Array:
    """d(T(l))/d eps for right perturbation: [C, 3, 6] = [R | -R hat(l)]."""
    C = local.shape[0]
    R = jnp.broadcast_to(pose.R, (C, 3, 3))
    Rl_hat = R @ se3.hat(local)
    return jnp.concatenate([R, -Rl_hat], axis=-1)


def error_point2point(pose: Pose, local: jax.Array, globl: jax.Array):
    """r = T(l) - g  (3-vec per pair). Reference: errorTerms.cpp:36-66."""
    tl = se3.apply(pose, local)
    r = tl - globl
    J = _point_jacobian(pose, local)
    return r, J


def error_point2line(
    pose: Pose, local: jax.Array, line_point: jax.Array, line_dir: jax.Array
):
    """r = (I - u uT)(T(l) - p_base): perpendicular offset from the global
    line (3-vec). Reference: errorTerms.cpp:68-113."""
    tl = se3.apply(pose, local)
    q = tl - line_point
    uq = jnp.sum(line_dir * q, axis=-1, keepdims=True)
    r = q - line_dir * uq
    P = jnp.eye(3) - jnp.einsum("ci,cj->cij", line_dir, line_dir)
    J = P @ _point_jacobian(pose, local)
    return r, J


def error_point2plane(
    pose: Pose, local: jax.Array, plane_centroid: jax.Array, plane_normal: jax.Array
):
    """r = -n (n . (T(l) - c)): projection vector onto the plane (3-vec,
    unit normals). Reference: errorTerms.cpp:115-161 (there the plane is
    (coefs, d); with unit normal and centroid c, n.g + d == n.(g - c))."""
    tl = se3.apply(pose, local)
    dist = jnp.sum(plane_normal * (tl - plane_centroid), axis=-1, keepdims=True)
    r = -plane_normal * dist
    nnT = -jnp.einsum("ci,cj->cij", plane_normal, plane_normal)
    J = nnT @ _point_jacobian(pose, local)
    return r, J


def error_plane2plane(
    pose: Pose, local_normal: jax.Array, global_normal: jax.Array
):
    """r = R n_l - n_g (3-vec). Reference: errorTerms.cpp:328-363.
    Insensitive to translation: J = [0 | -R hat(n_l)]."""
    Rn = se3.rotate(pose, local_normal)
    r = Rn - global_normal
    C = local_normal.shape[0]
    R = jnp.broadcast_to(pose.R, (C, 3, 3))
    J = jnp.concatenate(
        [jnp.zeros((C, 3, 3), local_normal.dtype), -(R @ se3.hat(local_normal))],
        axis=-1,
    )
    return r, J


def error_line2line(
    pose: Pose,
    local_point: jax.Array,
    local_dir: jax.Array,
    global_point: jax.Array,
    global_dir: jax.Array,
):
    """Branch-free 6-dim residual (see module docstring):
      r[:3] = (I - u_g u_gT)(T(p_l) - p_g)   — base point off the global line
      r[3:] = (R u_l) x u_g                  — direction misalignment
    """
    tl = se3.apply(pose, local_point)
    q = tl - global_point
    uq = jnp.sum(global_dir * q, axis=-1, keepdims=True)
    r_pos = q - global_dir * uq
    P = jnp.eye(3) - jnp.einsum("ci,cj->cij", global_dir, global_dir)
    J_pos = P @ _point_jacobian(pose, local_point)

    Ru = se3.rotate(pose, local_dir)
    r_dir = jnp.cross(Ru, global_dir)
    # d(Ru x u_g)/d eps = -hat(u_g) d(Ru)/d eps = -hat(u_g) [0 | -R hat(u_l)]
    C = local_dir.shape[0]
    R = jnp.broadcast_to(pose.R, (C, 3, 3))
    dRu = jnp.concatenate(
        [jnp.zeros((C, 3, 3), local_dir.dtype), -(R @ se3.hat(local_dir))], axis=-1
    )
    J_dir = -se3.hat(global_dir) @ dRu

    r = jnp.concatenate([r_pos, r_dir], axis=-1)
    J = jnp.concatenate([J_pos, J_dir], axis=-2)
    return r, J
