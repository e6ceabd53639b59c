"""SE(3) / SO(3) Lie-group math on JAX arrays.

TPU-native replacement for the reference's use of ``mrpt::poses::CPose3D``
(+ Lie exp/log) throughout mp2p_icp (reference: mp2p_icp/src/ICP.cpp:191-229
termination deltas, mp2p_icp/src/optimal_tf_gauss_newton.cpp:351-356 manifold
update). Everything here is pure jnp, float32 by default, fully batchable:
every function broadcasts over leading axes so it can be ``vmap``-ed or run
on stacked pose tensors directly.

Conventions:
- A pose is a ``Pose(R, t)`` pytree: rotation matrix ``R[..., 3, 3]`` and
  translation ``t[..., 3]``; action on points is ``x -> R @ x + t``.
- Tangent vectors are ``[rho (3), theta (3)]``: translation part first, then
  rotation (axis-angle), matching the reference's ``[x y z rx ry rz]``
  ordering of ``SE(3)::log`` used in its termination tests.
- Small-angle branches use 2nd-order Taylor expansions guarded with
  ``jnp.where`` so the functions stay differentiable and jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class Pose(NamedTuple):
    """SE(3) element: ``x -> R @ x + t``. Broadcasts over leading axes."""

    R: jax.Array  # [..., 3, 3]
    t: jax.Array  # [..., 3]

    @property
    def batch_shape(self):
        return self.t.shape[:-1]

    def as_matrix(self) -> jax.Array:
        """Homogeneous [..., 4, 4] matrix."""
        batch = self.t.shape[:-1]
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype), batch + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32, batch_shape=()) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return Pose(R, t)


def from_matrix(T: jax.Array) -> Pose:
    return Pose(T[..., :3, :3], T[..., :3, 3])


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: apply b first, then a."""
    R = a.R @ b.R
    t = jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t
    return Pose(R, t)


def inverse(p: Pose) -> Pose:
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t))


def apply(p: Pose, points: jax.Array) -> jax.Array:
    """Transform points [..., N, 3] (or [..., 3]) by pose."""
    return jnp.einsum("...ij,...nj->...ni", p.R, jnp.atleast_2d(points)).reshape(
        points.shape
    ) + jnp.broadcast_to(
        p.t[..., None, :] if points.ndim > p.t.ndim else p.t, points.shape
    )


def rotate(p: Pose, vecs: jax.Array) -> jax.Array:
    """Rotate vectors (no translation) — for normals / line directions."""
    return jnp.einsum("...ij,...nj->...ni", p.R, jnp.atleast_2d(vecs)).reshape(
        vecs.shape
    )


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: [..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jax.Array):
    """(A, B, C) = (sinθ/θ, (1-cosθ)/θ², (θ-sinθ)/θ³) with Taylor guards."""
    theta = jnp.sqrt(theta_sq + _EPS)
    small = theta_sq < 1e-8
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - A) / theta_sq)
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle [..., 3], numerically stable near 0 and π."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_vee = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sinθ * axis
    sin_theta = jnp.sin(theta)
    # Generic branch: θ/(2 sinθ) * vee(R - Rᵀ)
    generic_scale = jnp.where(
        jnp.abs(sin_theta) < 1e-6,
        0.5 + theta * theta / 12.0,  # Taylor of θ/(2 sinθ)
        theta / (2.0 * jnp.maximum(jnp.abs(sin_theta), _EPS)) * jnp.sign(sin_theta),
    )
    w_generic = generic_scale[..., None] * w_vee
    # Near π: vee(R - Rᵀ) ~ 0; recover axis from diagonal of (R + I)/2.
    near_pi = cos_theta < -1.0 + 1e-5
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums (R + Rᵀ has positive entries on the
    # axis outer product); pick the largest component as sign anchor.
    off = jnp.stack(
        [
            R[..., 2, 1] + R[..., 1, 2],  # ~ 2*ay*az
            R[..., 0, 2] + R[..., 2, 0],  # ~ 2*ax*az
            R[..., 1, 0] + R[..., 0, 1],  # ~ 2*ax*ay
        ],
        axis=-1,
    )
    imax = jnp.argmax(axis, axis=-1)
    sign_anchor = jnp.take_along_axis(axis, imax[..., None], axis=-1)
    signs = jnp.where(
        jnp.arange(3) == imax[..., None],
        1.0,
        jnp.sign(
            jnp.take_along_axis(
                # symmetric-part entries coupling component i to the anchor
                jnp.stack(
                    [
                        jnp.stack([diag[..., 0], off[..., 2], off[..., 1]], axis=-1),
                        jnp.stack([off[..., 2], diag[..., 1], off[..., 0]], axis=-1),
                        jnp.stack([off[..., 1], off[..., 0], diag[..., 2]], axis=-1),
                    ],
                    axis=-2,
                ),
                imax[..., None, None].repeat(3, axis=-2),
                axis=-1,
            ).squeeze(-1)
        ),
    )
    w_pi = theta[..., None] * axis * signs * jnp.sign(sign_anchor + _EPS)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): exp((w+dw)^) ≈ exp(w^) exp((J_r dw)^)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS)
    W = hat(w)
    small = theta_sq < 1e-8
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta_sq, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


def exp(tangent: jax.Array) -> Pose:
    """se(3) exp: [..., 6] = [rho, theta] -> Pose. t = J_l(theta) @ rho."""
    rho, theta = tangent[..., :3], tangent[..., 3:]
    R = so3_exp(theta)
    V = so3_left_jacobian(theta)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return Pose(R, t)


def log(p: Pose) -> jax.Array:
    """SE(3) log: Pose -> [..., 6] = [rho, theta]."""
    theta = so3_log(p.R)
    Vinv = so3_left_jacobian_inv(theta)
    rho = jnp.einsum("...ij,...j->...i", Vinv, p.t)
    return jnp.concatenate([rho, theta], axis=-1)


def _se3_Q(rho: jax.Array, theta: jax.Array) -> jax.Array:
    """Barfoot's Q(xi) matrix — the off-diagonal block of the SE(3) left
    Jacobian (State Estimation for Robotics, eq. 7.86). Taylor-guarded."""
    th_sq = jnp.sum(theta * theta, axis=-1)
    th = jnp.sqrt(th_sq + _EPS)
    P = hat(rho)
    T = hat(theta)
    small = th_sq < 1e-8
    # c1 = (th - sin th)/th^3
    c1 = jnp.where(small, 1.0 / 6.0 - th_sq / 120.0, (th - jnp.sin(th)) / (th_sq * th))
    # c2 = (1 - th^2/2 - cos th)/th^4
    c2 = jnp.where(
        small,
        1.0 / 24.0 - th_sq / 720.0,
        (1.0 - 0.5 * th_sq - jnp.cos(th)) / (th_sq * th_sq),
    )
    # c3 = 0.5 * (c2 - 3 (th - sin th - th^3/6)/th^5)
    c3_big = 0.5 * (
        c2 - 3.0 * (th - jnp.sin(th) - th_sq * th / 6.0) / (th_sq * th_sq * th)
    )
    c3 = jnp.where(small, 0.5 * (1.0 / 24.0 + 3.0 / 120.0), c3_big)
    TP = T @ P
    PT = P @ T
    TPT = TP @ T
    TT = T @ T
    return (
        0.5 * P
        + c1[..., None, None] * (TP + PT + T @ PT)
        - c2[..., None, None] * (TT @ P + P @ TT - 3.0 * TPT)
        - c3[..., None, None] * (TPT @ T + TT @ PT)
    )


def se3_left_jacobian_inv(xi: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SE(3) for tangent xi = [rho, theta]:
    6x6 [[Jl^-1, -Jl^-1 Q Jl^-1], [0, Jl^-1]]. Used for exact prior-factor
    Jacobians (the reference calls MRPT's jacob_dDinvP1invP2_de1e2,
    optimal_tf_gauss_newton.cpp:325-336)."""
    rho, theta = xi[..., :3], xi[..., 3:]
    Jinv = so3_left_jacobian_inv(theta)
    Q = _se3_Q(rho, theta)
    top = jnp.concatenate([Jinv, -Jinv @ Q @ Jinv], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(Q), Jinv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_right_jacobian_inv(xi: jax.Array) -> jax.Array:
    """Jr^-1(xi) = Jl^-1(-xi)."""
    return se3_left_jacobian_inv(-xi)


def adjoint(p: Pose) -> jax.Array:
    """SE(3) adjoint for tangent ordering [rho, theta]:
    Ad(T) = [[R, hat(t) R], [0, R]] (6x6), such that
    T exp(xi) T^-1 = exp(Ad(T) xi)."""
    tR = hat(p.t) @ p.R
    top = jnp.concatenate([p.R, tR], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(p.R), p.R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] = (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the 4-candidate construction (one per largest diagonal element of the
    4x4 quaternion outer-product matrix) and selects by argmax — jit-safe.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # 4 * q_i^2 - 1 = candidate "traces"
    tw = 1.0 + r00 + r11 + r22
    tx = 1.0 + r00 - r11 - r22
    ty = 1.0 - r00 + r11 - r22
    tz = 1.0 - r00 - r11 + r22
    # Candidate quaternions (unnormalised), one assuming each component largest
    qw = jnp.stack([tw, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    qx = jnp.stack([r21 - r12, tx, r01 + r10, r02 + r20], axis=-1)
    qy = jnp.stack([r02 - r20, r01 + r10, ty, r12 + r21], axis=-1)
    qz = jnp.stack([r10 - r01, r02 + r20, r12 + r21, tz], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4(cand), 4(comp)]
    traces = jnp.stack([tw, tx, ty, tz], axis=-1)
    best = jnp.argmax(traces, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q.squeeze(-2)
    q = q * jnp.sign(q[..., :1] + _EPS)  # canonical w >= 0
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_xyz_ypr(x, y, z, yaw, pitch, roll, dtype=jnp.float32) -> Pose:
    """Build pose from translation + yaw/pitch/roll (ZYX convention, radians),
    matching the reference's CPose3D(x,y,z,yaw,pitch,roll) constructor."""
    x, y, z, yaw, pitch, roll = (
        jnp.asarray(v, dtype=dtype) for v in (x, y, z, yaw, pitch, roll)
    )
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    R = jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1),
            jnp.stack([-sp, cp * sr, cp * cr], -1),
        ],
        axis=-2,
    )
    t = jnp.stack([x, y, z], axis=-1)
    return Pose(R, t)


def delta_norms(a: Pose, b: Pose):
    """(translation, rotation) magnitudes of log(a⁻¹ ∘ b) — the reference's
    termination metric (ICP.cpp:191-229 computes |Δt| and |Δθ| separately)."""
    d = log(compose(inverse(a), b))
    return jnp.linalg.norm(d[..., :3], axis=-1), jnp.linalg.norm(d[..., 3:], axis=-1)


def error_log_norm(gt: Pose, est: Pose) -> jax.Array:
    """‖log(gt⁻¹ ∘ est)‖ — the reference's end-to-end accuracy metric
    (tests/test-mp2p_icp_algos.cpp:223 asserts < 0.1)."""
    return jnp.linalg.norm(log(compose(inverse(gt), est)), axis=-1)


def random_pose(key: jax.Array, max_trans: float = 1.0, max_angle: float = 3.1415) -> Pose:
    """Uniform random pose for tests: random axis, angle U(0, max_angle),
    translation components U(-max_trans, max_trans)."""
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.linalg.norm(axis)
    angle = jax.random.uniform(k2, (), minval=0.0, maxval=max_angle)
    t = jax.random.uniform(k3, (3,), minval=-max_trans, maxval=max_trans)
    return Pose(so3_exp(axis * angle), t)
