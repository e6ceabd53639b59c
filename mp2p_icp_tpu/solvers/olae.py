"""OLAE closed-form optimal-attitude solver.

Reference parity: mp2p_icp/src/optimal_tf_olae.cpp:65-361 — attitude-profile
matrix B = sum w b rT over *unit* vector pairs, Gibbs-vector linear system
M g = v, plus the three sequential-rotation alternates (180 deg about x/y/z,
[shuster1981attitude]) to dodge the Gibbs singularity at theta = pi; the
best-conditioned system (max |det M|) wins.

TPU-first: all four candidate 3x3 systems are built and solved in one
batched ``jnp.linalg.solve`` and the winner is selected with ``argmax`` —
branch-free, no host control flow (the reference if/else-chains on |det|,
optimal_tf_olae.cpp:302-347).
"""

from __future__ import annotations

from typing import Optional

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


def gibbs_to_rot(g: jnp.ndarray) -> jnp.ndarray:
    """Gibbs (Rodrigues) vector -> rotation matrix, via the quaternion
    q = (1, -g) / sqrt(1 + |g|^2). The sign flip matches the solved
    system's convention (reference: gibbs2pose, optimal_tf_olae.cpp:33-44
    builds the quaternion with negated vector part)."""
    q = jnp.concatenate([jnp.ones_like(g[..., :1]), -g], axis=-1)
    return se3.quat_to_rot(q)


def olae_attitude(vp: VectorPairs) -> jnp.ndarray:
    """Optimal rotation matrix from unit vector pairs."""
    w_sum = jnp.maximum(jnp.sum(vp.w), 1e-30)
    wn = vp.w / w_sum
    B = jnp.einsum("c,ci,cj->ij", wn, vp.b, vp.r)
    # v = -sum w (b x r)  (the reference accumulates -= w * (b x r))
    v = -jnp.einsum("c,ci->i", wn, jnp.cross(vp.b, vp.r))
    S = B + B.T
    p = jnp.trace(B) + 1.0
    m = jnp.trace(B) - 1.0
    M0 = S - p * jnp.eye(3, dtype=B.dtype)
    z1, z2, z3 = v[0], v[1], v[2]

    # Sequential-rotation alternates (reference: optimal_tf_olae.cpp:180-233)
    Mx = jnp.array(
        [
            [m, -z3, z2],
            [-z3, M0[2, 2], -S[1, 2]],
            [z2, -S[1, 2], M0[1, 1]],
        ]
    )
    vx = jnp.array([-z1, S[0, 2], -S[0, 1]])
    My = jnp.array(
        [
            [M0[2, 2], z3, -S[0, 2]],
            [z3, m, -z1],
            [-S[0, 2], -z1, M0[0, 0]],
        ]
    )
    vy = jnp.array([-S[1, 2], -z2, S[0, 1]])
    Mz = jnp.array(
        [
            [M0[1, 1], -S[0, 1], -z2],
            [-S[0, 1], M0[0, 0], z1],
            [-z2, z1, m],
        ]
    )
    vz = jnp.array([S[1, 2], -S[0, 2], -z3])

    Ms = jnp.stack([M0, Mx, My, Mz])  # [4, 3, 3]
    vs = jnp.stack([v, vx, vy, vz])  # [4, 3]
    dets = jnp.abs(jnp.linalg.det(Ms))
    # regularise near-singular candidates so the batched solve never NaNs;
    # the argmax winner is by construction the best-conditioned one.
    reg = jnp.where(dets < 1e-20, 1e-9, 0.0)
    Ms_safe = Ms + reg[:, None, None] * jnp.eye(3, dtype=B.dtype)
    gs = jnp.linalg.solve(Ms_safe, vs[..., None])[..., 0]  # [4, 3]
    Rs = gibbs_to_rot(gs)  # [4, 3, 3]
    # Pre-rotations: identity, 180deg about x, y, z — composed on the left
    # (reference composes CPose3D(0,0,0,yaw/pitch/roll=pi) + sol).
    pre = jnp.stack(
        [
            jnp.eye(3),
            jnp.diag(jnp.array([1.0, -1.0, -1.0])),  # Rx(pi)
            jnp.diag(jnp.array([-1.0, 1.0, -1.0])),  # Ry(pi)
            jnp.diag(jnp.array([-1.0, -1.0, 1.0])),  # Rz(pi)
        ]
    )
    R_cands = pre @ Rs
    best = jnp.argmax(dets)
    return R_cands[best]


def optimal_tf_olae(
    pairings: Pairings,
    wp: Optional[WeightParameters] = None,
    current_estimate: Optional[Pose] = None,
) -> Pose:
    wp = wp or WeightParameters()
    vp = build_vector_pairs(
        pairings, wp, normalize_point_vectors=True, current_estimate=current_estimate
    )
    R = olae_attitude(vp)
    t = translation_from_centroids(R, vp.ct_local, vp.ct_global)
    # degenerate input guard (see horn_from_vector_pairs)
    ok = jnp.sum(vp.w) > 0
    return Pose(
        jnp.where(ok, R, jnp.eye(3, dtype=R.dtype)),
        jnp.where(ok, t, jnp.zeros_like(t)),
    )
