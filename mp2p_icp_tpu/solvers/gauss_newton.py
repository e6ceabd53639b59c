"""Gauss-Newton SE(3) optimiser over all five pairing types.

Reference parity: mp2p_icp/src/optimal_tf_gauss_newton.cpp:36-372 —
relinearised GN steps: accumulate H (6x6) and g from weighted residual
Jacobians of every pairing block, optional robust kernel re-weighting,
optional SE(3) prior folded into H/g (:311-341), solve H delta = -g, update
pose on the manifold (:351-356), inner-loop iterations with min-delta early
stop.

TPU-first: each block's (H, g) contribution is one masked einsum over the
fixed-capacity pairing tensors (the reference's TBB parallel_reduce,
:77-145, becomes a single fused XLA reduction); the inner loop is a
``lax.fori_loop`` whose body is a no-op once converged (branch-free early
stop — cheaper than a while_loop for <=10 iterations). The prior Jacobian
uses jax autodiff of our own log map instead of the reference's
``jacob_dDinvP1invP2_de1e2`` closed form.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pairings import Pairings
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.solvers import error_terms
from mp2p_icp_tpu.solvers.common import PairWeights
from mp2p_icp_tpu.solvers.robust import RobustKernel, robust_sqrt_weight


@dataclasses.dataclass(frozen=True)
class GNParams:
    """Reference: OptimalTF_GN_Parameters (optimal_tf_gauss_newton.h)."""

    max_iterations: int = 3
    min_delta: float = 1e-7
    max_cost: float = 0.0  # stop once sqrt(total weighted errSq) <= this
    kernel: RobustKernel = RobustKernel.NONE
    kernel_param: float = 1.0
    pair_weights: PairWeights = dataclasses.field(default_factory=PairWeights)
    # innovative vs reference: tikhonov damping for rank-deficient pairings
    damping: float = 1e-9


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SE3Prior:
    """Gaussian prior on the pose (reference: Solver.h SolverContext prior —
    mean + 6x6 information matrix)."""

    mean: Pose
    inv_cov: jax.Array  # [6, 6] information matrix


def _accumulate(H, g, err_sq_total, r, J, w_pairs, kernel, kernel_param):
    """Add one block's weighted contributions.
    r: [C, D], J: [C, D, 6], w_pairs: [C] (0 => masked out)."""
    r_sq = jnp.sum(r * r, axis=-1)
    w = w_pairs
    if kernel != RobustKernel.NONE:
        w = w * robust_sqrt_weight(kernel, r_sq, kernel_param)
    Jt_r = jnp.einsum("c,cdk,cd->k", w, J, r)
    JtJ = jnp.einsum("c,cdk,cdl->kl", w, J, J)
    return H + JtJ, g + Jt_r, err_sq_total + jnp.sum(w * r_sq)


def _robust_w(base_w, r_sq, kernel, kernel_param):
    if kernel == RobustKernel.NONE:
        return base_w
    return base_w * robust_sqrt_weight(kernel, r_sq, kernel_param)


def _pt2pt_closed_form(pose, local, globl, w):
    """Closed-form (H, g, errSq) for point-to-point pairs.

    With the right-perturbation Jacobian J = [R | -R hat(l)] the normal
    blocks collapse to weighted [C, 3] cross/outer reductions:
      g  = [ R^T s_r ;  sum w l x (R^T r) ]          (s_r = sum w r)
      H  = [[ (sum w) I , -hat(sum w l) ],
            [  hat(sum w l), (sum w |l|^2) I - sum w l l^T ]]
    No [C, 3, 6] Jacobian tensors — those layouts cost ~ms on TPU (small
    minor dims waste the vector lanes)."""
    q = se3.apply(pose, local)
    r = q - globl  # [C, 3]
    rtR = r @ pose.R  # R^T r per pair, [C, 3]
    sw = jnp.sum(w)
    s_l = jnp.einsum("c,ci->i", w, local)
    g_top = jnp.einsum("c,ci->i", w, rtR)
    g_bot = jnp.einsum("c,ci->i", w, jnp.cross(local, rtR))
    M = jnp.einsum("c,ci,cj->ij", w, local, local)
    l_sq = jnp.einsum("c,ci,ci->", w, local, local)
    eye = jnp.eye(3, dtype=local.dtype)
    H = jnp.zeros((6, 6), jnp.float32)
    H = H.at[:3, :3].set(sw * eye)
    H = H.at[:3, 3:].set(-se3.hat(s_l))
    H = H.at[3:, :3].set(se3.hat(s_l))
    H = H.at[3:, 3:].set(l_sq * eye - M)
    g = jnp.concatenate([g_top, g_bot])
    err = jnp.einsum("c,ci,ci->", w, r, r)
    return H, g, err, jnp.sum(r * r, axis=-1)


def gn_build_normal_equations(
    pose: Pose,
    pairings: Pairings,
    params: GNParams,
    prior: Optional[SE3Prior] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One linearisation: (H [6,6], g [6], total weighted squared error).

    pt2pt / pt2pl / pt2ln use closed-form block reductions over [C, 3]
    arrays (see _pt2pt_closed_form); ln2ln / pl2pl (small counts) go
    through the general Jacobian path (error_terms). The two paths agree —
    asserted by tests/test_optimal_tf.py::TestClosedFormEquivalence."""
    pw = params.pair_weights
    H = jnp.zeros((6, 6), jnp.float32)
    g = jnp.zeros((6,), jnp.float32)
    e = jnp.zeros((), jnp.float32)

    # ---- pt2pt (closed form; robust kernel applied via a pre-pass r_sq)
    p = pairings.pt2pt
    if params.kernel != RobustKernel.NONE:
        q_pts = se3.apply(pose, p.local)
        r_sq0 = jnp.sum(jnp.square(q_pts - p.globl), axis=-1)
        w_pt = _robust_w(p.weight * pw.pt2pt, r_sq0, params.kernel,
                         params.kernel_param)
    else:
        w_pt = p.weight * pw.pt2pt
    Hp, gp, ep, _ = _pt2pt_closed_form(pose, p.local, p.globl, w_pt)
    H, g, e = H + Hp, g + gp, e + ep

    # ---- pt2pl: J^T J = w u u^T with u = [R^T n ; l x R^T n], residual
    # e_c = n . (T(l) - c) (scalar per pair)
    s = pairings.pt2pl
    q_pl = se3.apply(pose, s.local)
    e_c = jnp.sum(s.plane_normal * (q_pl - s.plane_centroid), axis=-1)
    w_pl = _robust_w(
        s.weight * pw.pt2pl, e_c * e_c, params.kernel, params.kernel_param
    )
    a = s.plane_normal @ pose.R  # R^T n, [C, 3]
    u = jnp.concatenate([a, jnp.cross(s.local, a)], axis=-1)  # [C, 6]
    H = H + jnp.einsum("c,ci,cj->ij", w_pl, u, u)
    g = g + jnp.einsum("c,c,ci->i", w_pl, e_c, u)
    e = e + jnp.einsum("c,c,c->", w_pl, e_c, e_c)

    # ---- pt2ln: H = H_pt2pt_form - sum w v v^T (v = [R^T d ; l x R^T d]),
    # g from the projected residual
    t = pairings.pt2ln
    q_ln = se3.apply(pose, t.local)
    diff = q_ln - t.line_point
    along = jnp.sum(t.line_dir * diff, axis=-1, keepdims=True)
    r_ln = diff - t.line_dir * along  # projected residual [C, 3]
    w_ln = _robust_w(
        t.weight * pw.pt2ln, jnp.sum(r_ln * r_ln, axis=-1),
        params.kernel, params.kernel_param,
    )
    Hl, _, _, _ = _pt2pt_closed_form(pose, t.local, t.line_point, w_ln)
    b = t.line_dir @ pose.R  # R^T d
    v = jnp.concatenate([b, jnp.cross(t.local, b)], axis=-1)
    H = H + Hl - jnp.einsum("c,ci,cj->ij", w_ln, v, v)
    rtR_ln = r_ln @ pose.R
    g = g + jnp.concatenate(
        [
            jnp.einsum("c,ci->i", w_ln, rtR_ln),
            jnp.einsum("c,ci->i", w_ln, jnp.cross(t.local, rtR_ln)),
        ]
    )
    e = e + jnp.einsum("c,ci,ci->", w_ln, r_ln, r_ln)

    ll = pairings.ln2ln
    r, J = error_terms.error_line2line(
        pose, ll.local_point, ll.local_dir, ll.global_point, ll.global_dir
    )
    H, g, e = _accumulate(
        H, g, e, r, J, ll.weight * pw.ln2ln, params.kernel, params.kernel_param
    )

    pp = pairings.pl2pl
    r, J = error_terms.error_plane2plane(pose, pp.local_normal, pp.global_normal)
    H, g, e = _accumulate(
        H, g, e, r, J, pp.weight * pw.pl2pl, params.kernel, params.kernel_param
    )

    if prior is not None:
        # residual: log(prior_mean^-1 ∘ pose); its exact Jacobian w.r.t. a
        # right perturbation of pose is the inverse right Jacobian of SE(3)
        # at the residual (closed form — autodiff through log NaNs at 0).
        r0 = se3.log(se3.compose(se3.inverse(prior.mean), pose))
        Jp = se3.se3_right_jacobian_inv(r0)
        H = H + Jp.T @ prior.inv_cov @ Jp
        g = g + Jp.T @ (prior.inv_cov @ r0)
        e = e + r0 @ prior.inv_cov @ r0

    return H, g, e


def solve_normal_equations(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Compensated f32 solve of H x = g for SPD H (6x6).

    The reference solves its normal equations in f64
    (optimal_tf_gauss_newton.cpp `H.ldlt()`); TPU f32 loses ~3 digits on
    near-degenerate geometry (points almost on a line/plane). Jacobi
    equilibration D H D removes the scale imbalance between rotation and
    translation blocks, and one step of iterative refinement recovers the
    residual error of the first f32 factorisation — together they extend
    the solvable condition range to ~1/eps_f32 without f64 emulation.
    """
    d = jax.lax.rsqrt(jnp.clip(jnp.diagonal(H), 1e-30, None))
    Hs = H * d[:, None] * d[None, :]
    gs = g * d
    cf = jax.scipy.linalg.cho_factor(Hs)
    y = jax.scipy.linalg.cho_solve(cf, gs)
    r = gs - Hs @ y
    y = y + jax.scipy.linalg.cho_solve(cf, r)
    return y * d


def optimal_tf_gauss_newton(
    pairings: Pairings,
    linearization_point: Pose,
    params: Optional[GNParams] = None,
    prior: Optional[SE3Prior] = None,
) -> Pose:
    """Iterated GN from a linearisation point (reference requires one too,
    optimal_tf_gauss_newton.cpp:45-48)."""
    params = params or GNParams()

    def body(_, carry):
        pose, done = carry
        H, g, err_sq = gn_build_normal_equations(pose, pairings, params, prior)
        Hd = H + params.damping * jnp.eye(6, dtype=H.dtype)
        delta = -solve_normal_equations(Hd, g)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        new_pose = se3.compose(pose, se3.exp(delta))
        # convergence tests (reference :344-346, :365-366)
        reached_cost = jnp.sqrt(err_sq) <= params.max_cost
        small = jnp.linalg.norm(delta) < params.min_delta
        new_done = done | reached_cost | small
        keep = jnp.where(done | reached_cost, 0.0, 1.0)
        pose_out = Pose(
            R=pose.R * (1 - keep) + new_pose.R * keep,
            t=pose.t * (1 - keep) + new_pose.t * keep,
        )
        return pose_out, new_done

    pose, _ = jax.lax.fori_loop(
        0,
        params.max_iterations,
        body,
        (linearization_point, jnp.asarray(False)),
    )
    return pose
