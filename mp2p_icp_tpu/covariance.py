"""Covariance of the final ICP fit.

Reference parity: mp2p_icp/src/covariance.cpp:30-141 — the reference
finite-differences the full residual stack w.r.t. (x y z yaw pitch roll) and
returns (JT J)^-1, falling back to 1e6*I with no pairings. (It also has a
copy-paste bug — covariance.cpp:43-48 sets x twice and never z — that a
from-scratch implementation naturally avoids.)

TPU-first: we already have exact analytic Jacobians for every pairing type
(solvers/error_terms.py), so cov = (H)^-1 with H the unweighted (robust
kernel off) Gauss-Newton normal matrix at the final pose — no finite
differences. Tangent convention is the right se(3) perturbation [rho, theta]
(the reference uses global xyz+ypr; both are 6-dof local charts and agree to
first order at identity increments).
"""

from __future__ import annotations

import jax.numpy as jnp

from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.solvers.gauss_newton import GNParams, gn_build_normal_equations

SIGMA_NO_PAIRINGS = 1.0e6  # reference: covariance.cpp returns 1e6*I


def covariance(pairings: Pairings, final_pose: Pose) -> jnp.ndarray:
    """6x6 covariance of the pose estimate from the final pairings."""
    H, _, _ = gn_build_normal_equations(final_pose, pairings, GNParams())
    n = pairings.size()
    H_safe = H + 1e-9 * jnp.eye(6, dtype=H.dtype)
    # equilibrated f32 inverse: inv(H) = D inv(D H D) D — stable on the
    # near-degenerate geometry where the raw f32 inverse loses all digits
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H_safe), 1e-30, None))
    dinv = 1.0 / d
    Hs = H_safe * dinv[:, None] * dinv[None, :]
    cov = jnp.linalg.inv(Hs) * dinv[:, None] * dinv[None, :]
    fallback = SIGMA_NO_PAIRINGS * jnp.eye(6, dtype=H.dtype)
    return jnp.where(n > 0, cov, fallback)
