"""Pose-graph optimisation (SE(3) graph SLAM back-end).

Greenfield relative to the reference — mp2p_icp computes only per-pair
covariances (covariance.cpp:30-141); the full-sequence back-end envisioned
in BASELINE.json ("distributed pose-graph + Schur-complement BA") starts
here. The design is TPU-first:

- all edge residuals r_ij = log(Z_ij^-1 T_i^-1 T_j) and their analytic
  Jacobians (right-perturbation: J_j = Jr^-1(r), J_i = -Jr^-1(r) Ad(T_j^-1
  T_i)) evaluate as ONE batched computation over the edge list;
- the normal system is scatter-assembled into a dense [6N, 6N] H (fine
  through N ~ thousands on one chip; the multi-host Schur/partitioned
  variant shards nodes over the mesh and psums partial H blocks);
- Gauss-Newton with Levenberg damping and a gauge prior on node 0;
- everything jits; the iteration loop is lax.fori_loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.se3 import Pose


class PoseGraphEdges(NamedTuple):
    """Batched SE(3) constraints: T_i^-1 T_j ~ Z (measurement)."""

    i: jax.Array  # [E] i32 source node
    j: jax.Array  # [E] i32 target node
    z: Pose  # measured relative pose, batched [E]
    information: jax.Array  # [E, 6, 6]
    valid: jax.Array  # [E] bool


def edge_residuals(poses: Pose, edges: PoseGraphEdges):
    """r [E, 6] and Jacobians Ji, Jj [E, 6, 6] for all edges at once."""
    Ti = Pose(poses.R[edges.i], poses.t[edges.i])
    Tj = Pose(poses.R[edges.j], poses.t[edges.j])
    rel = se3.compose(se3.inverse(Ti), Tj)
    err_pose = se3.compose(se3.inverse(edges.z), rel)
    r = se3.log(err_pose)
    Jr_inv = jax.vmap(se3.se3_right_jacobian_inv)(r)
    # de/dxi_i = -Jr^-1(r) Ad(T_j^-1 T_i) = -Jr^-1(r) Ad(rel^-1)
    Ad_rel_inv = jax.vmap(se3.adjoint)(se3.inverse(rel))
    Jj = Jr_inv
    Ji = -jnp.einsum("eab,ebc->eac", Jr_inv, Ad_rel_inv)
    return r, Ji, Jj


def _assemble(poses: Pose, edges: PoseGraphEdges, gauge_weight: float):
    """Dense normal system (H [6N, 6N], g [6N]) from all edges."""
    N = poses.t.shape[0]
    r, Ji, Jj = edge_residuals(poses, edges)
    w = edges.valid.astype(jnp.float32)
    Li = jnp.einsum("e,eab,ebc->eac", w, jnp.swapaxes(Ji, 1, 2), edges.information)
    Lj = jnp.einsum("e,eab,ebc->eac", w, jnp.swapaxes(Jj, 1, 2), edges.information)
    Hii = jnp.einsum("eab,ebc->eac", Li, Ji)
    Hij = jnp.einsum("eab,ebc->eac", Li, Jj)
    Hjj = jnp.einsum("eab,ebc->eac", Lj, Jj)
    gi = jnp.einsum("eab,eb->ea", Li, r)
    gj = jnp.einsum("eab,eb->ea", Lj, r)

    H = jnp.zeros((N, N, 6, 6), jnp.float32)
    H = H.at[edges.i, edges.i].add(Hii)
    H = H.at[edges.i, edges.j].add(Hij)
    H = H.at[edges.j, edges.i].add(jnp.swapaxes(Hij, 1, 2))
    H = H.at[edges.j, edges.j].add(Hjj)
    g = jnp.zeros((N, 6), jnp.float32)
    g = g.at[edges.i].add(gi)
    g = g.at[edges.j].add(gj)

    # gauge prior on node 0
    H = H.at[0, 0].add(gauge_weight * jnp.eye(6))

    Hd = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
    gd = g.reshape(6 * N)
    chi2 = jnp.sum(
        w * jnp.einsum("ea,eab,eb->e", r, edges.information, r)
    )
    return Hd, gd, chi2


@dataclasses.dataclass(frozen=True)
class PoseGraphParams:
    max_iterations: int = 10
    damping: float = 1e-6
    gauge_weight: float = 1e6


def optimize_pose_graph(
    poses: Pose, edges: PoseGraphEdges, params: PoseGraphParams = PoseGraphParams()
):
    """Batched GN pose-graph optimisation. Returns (poses, final_chi2)."""
    N = poses.t.shape[0]

    def body(_, carry):
        poses, _ = carry
        H, g, chi2 = _assemble(poses, edges, params.gauge_weight)
        Hd = H + params.damping * jnp.eye(6 * N, dtype=H.dtype)
        delta = -jax.scipy.linalg.solve(Hd, g, assume_a="pos")
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0).reshape(N, 6)
        new = jax.vmap(lambda p_R, p_t, d: se3.compose(
            Pose(p_R, p_t), se3.exp(d)))(poses.R, poses.t, delta)
        return new, chi2

    final_poses, chi2 = jax.lax.fori_loop(
        0, params.max_iterations, body, (poses, jnp.asarray(0.0))
    )
    _, _, final_chi2 = _assemble(final_poses, edges, params.gauge_weight)
    return final_poses, final_chi2


def _edge_terms(poses: Pose, edges: PoseGraphEdges):
    """Per-edge weighted Jacobian products used by both the dense assembly
    and the matrix-free path: (r, Ji, Jj, Li, Lj) with L* = w J*ᵀ Ω."""
    r, Ji, Jj = edge_residuals(poses, edges)
    w = edges.valid.astype(jnp.float32)
    Li = jnp.einsum("e,eab,ebc->eac", w, jnp.swapaxes(Ji, 1, 2), edges.information)
    Lj = jnp.einsum("e,eab,ebc->eac", w, jnp.swapaxes(Jj, 1, 2), edges.information)
    return r, Ji, Jj, Li, Lj


def _hvp(edges: PoseGraphEdges, Ji, Jj, Li, Lj, v, n_nodes: int):
    """H @ v without materializing H: per-edge gather, 6x6 matvecs, scatter.

    v: [N, 6]. Returns [N, 6]. O(E) work and memory — the TPU-native
    condensed-system product for graphs too large for the dense [6N, 6N]
    assembly (SURVEY.md §2.6 'distributed pose-graph/BA').
    """
    vi = v[edges.i]  # [E, 6]
    vj = v[edges.j]
    # Jv = Ji vi + Jj vj  (residual-space directional derivative)
    Jv = jnp.einsum("eab,eb->ea", Ji, vi) + jnp.einsum("eab,eb->ea", Jj, vj)
    # scatter back JᵀΩ(Jv):  Li/Lj already fold w and Ω
    out = jnp.zeros((n_nodes, 6), v.dtype)
    out = out.at[edges.i].add(jnp.einsum("eab,eb->ea", Li, Jv))
    out = out.at[edges.j].add(jnp.einsum("eab,eb->ea", Lj, Jv))
    return out


def _block_diag_sums(edges: PoseGraphEdges, Ji, Jj, Li, Lj, n_nodes: int):
    """Per-node 6x6 diagonal block sums of H (before gauge/damping)."""
    Hii = jnp.einsum("eab,ebc->eac", Li, Ji)
    Hjj = jnp.einsum("eab,ebc->eac", Lj, Jj)
    D = jnp.zeros((n_nodes, 6, 6), jnp.float32)
    D = D.at[edges.i].add(Hii)
    D = D.at[edges.j].add(Hjj)
    return D


@dataclasses.dataclass(frozen=True)
class PoseGraphCGParams:
    max_iterations: int = 10
    cg_iterations: int = 50
    damping: float = 1e-4
    gauge_weight: float = 1e6
    cg_tol: float = 1e-8


def optimize_pose_graph_cg(
    poses: Pose,
    edges: PoseGraphEdges,
    params: PoseGraphCGParams = PoseGraphCGParams(),
    mesh=None,
    axis: str = "data",
):
    """Matrix-free Gauss-Newton pose-graph optimisation for large graphs.

    The normal system H δ = -g is solved by block-Jacobi-preconditioned
    conjugate gradients where H@v is evaluated edge-wise (gather → 6x6
    matvec → scatter-add), so memory is O(N + E) instead of O(N²). With a
    ``mesh``, edges are sharded over ``axis`` and every edge-wise reduction
    (g, H@v, preconditioner blocks, chi²) is ``psum``-reduced over ICI —
    the distributed condensed-system back-end of SURVEY.md §2.6/§5.8
    (greenfield; the reference has only per-pair covariance,
    covariance.cpp:30-141).

    Returns (poses, final_chi2) — chi2 is re-evaluated AT the returned
    poses (the dense optimize_pose_graph does the same), not the stale
    value from before the last update.
    """
    N = poses.t.shape[0]

    def chi2_at(poses, edges_shard):
        r, *_ = _edge_terms(poses, edges_shard)
        w = edges_shard.valid.astype(jnp.float32)
        c = jnp.sum(
            w * jnp.einsum("ea,eab,eb->e", r, edges_shard.information, r)
        )
        if mesh is not None:
            c = jax.lax.psum(c, axis)
        return c

    def gn_step(poses, edges_shard):
        r, Ji, Jj, Li, Lj = _edge_terms(poses, edges_shard)
        g = jnp.zeros((N, 6), jnp.float32)
        g = g.at[edges_shard.i].add(jnp.einsum("eab,eb->ea", Li, r))
        g = g.at[edges_shard.j].add(jnp.einsum("eab,eb->ea", Lj, r))
        w = edges_shard.valid.astype(jnp.float32)
        chi2 = jnp.sum(w * jnp.einsum("ea,eab,eb->e", r, edges_shard.information, r))
        D = _block_diag_sums(edges_shard, Ji, Jj, Li, Lj, N)
        if mesh is not None:
            g = jax.lax.psum(g, axis)
            chi2 = jax.lax.psum(chi2, axis)
            D = jax.lax.psum(D, axis)
        D = D.at[0].add(params.gauge_weight * jnp.eye(6))
        Minv = jnp.linalg.inv(D + params.damping * jnp.eye(6))

        def A(v):
            hv = _hvp(edges_shard, Ji, Jj, Li, Lj, v, N)
            if mesh is not None:
                hv = jax.lax.psum(hv, axis)
            hv = hv.at[0].add(params.gauge_weight * v[0])
            return hv + params.damping * v

        def precond(v):
            return jnp.einsum("nab,nb->na", Minv, v)

        # PCG on A δ = -g
        b = -g
        x = jnp.zeros_like(b)
        rres = b - A(x)
        z = precond(rres)
        p = z
        rz = jnp.sum(rres * z)

        def cg_body(_, carry):
            x, rres, p, rz = carry
            Ap = A(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x2 = x + alpha * p
            r2 = rres - alpha * Ap
            z2 = precond(r2)
            rz2 = jnp.sum(r2 * z2)
            beta = rz2 / jnp.maximum(rz, 1e-30)
            p2 = z2 + beta * p
            # freeze once converged (static trip count, masked updates)
            live = rz >= params.cg_tol
            x2 = jnp.where(live, x2, x)
            r2 = jnp.where(live, r2, rres)
            p2 = jnp.where(live, p2, p)
            rz2 = jnp.where(live, rz2, rz)
            return x2, r2, p2, rz2

        x, _, _, _ = jax.lax.fori_loop(
            0, params.cg_iterations, cg_body, (x, rres, p, rz)
        )
        delta = jnp.where(jnp.isfinite(x), x, 0.0)
        new = jax.vmap(
            lambda R, t, d: se3.compose(Pose(R, t), se3.exp(d))
        )(poses.R, poses.t, delta)
        return new, chi2

    if mesh is None:

        @jax.jit
        def run(poses, edges):
            def body(_, carry):
                p, _ = carry
                return gn_step(p, edges)

            final, _ = jax.lax.fori_loop(
                0, params.max_iterations, body, (poses, jnp.asarray(0.0))
            )
            return final, chi2_at(final, edges)

        return run(poses, edges)

    from jax.sharding import PartitionSpec as P

    import functools

    try:
        from jax import shard_map as _sm
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        shard_map = functools.partial(_sme, check_rep=False)

    n_dev = mesh.shape[axis]
    E = edges.i.shape[0]
    if E % n_dev != 0:
        raise ValueError(
            f"edge count {E} not divisible by mesh axis size {n_dev}; pad "
            "with valid=False edges"
        )
    edge_spec = PoseGraphEdges(
        i=P(axis), j=P(axis), z=Pose(P(axis), P(axis)),
        information=P(axis), valid=P(axis),
    )
    sharded_step = shard_map(
        gn_step, mesh=mesh,
        in_specs=(Pose(P(), P()), edge_spec),
        out_specs=(Pose(P(), P()), P()),
    )
    sharded_chi2 = shard_map(
        chi2_at, mesh=mesh,
        in_specs=(Pose(P(), P()), edge_spec),
        out_specs=P(),
    )

    @jax.jit
    def run(poses, edges):
        def body(_, carry):
            p, _ = carry
            return sharded_step(p, edges)

        final, _ = jax.lax.fori_loop(
            0, params.max_iterations, body, (poses, jnp.asarray(0.0))
        )
        return final, sharded_chi2(final, edges)

    return run(poses, edges)


def optimize_pose_graph_sharded(
    poses: Pose,
    edges: PoseGraphEdges,
    mesh,
    params: PoseGraphParams = PoseGraphParams(),
    axis: str = "data",
):
    """Distributed pose-graph GN: edges are sharded over a mesh axis, each
    device assembles its partial (H, g) from its edge shard, and a ``psum``
    over ICI reduces them before the (replicated) solve — the
    Schur-complement-style distributed BA reduction of BASELINE.json
    (SURVEY.md §5.8). Poses are replicated (they are small); only the edge
    set — the big term — is partitioned.

    The edge count must be divisible by the axis size (pad with
    valid=False edges).
    """
    from jax.sharding import PartitionSpec as P

    import functools

    try:
        from jax import shard_map as _sm
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        shard_map = functools.partial(_sme, check_rep=False)

    N = poses.t.shape[0]
    n_dev = mesh.shape[axis]
    E = edges.i.shape[0]
    if E % n_dev != 0:
        raise ValueError(
            f"edge count {E} not divisible by mesh axis size {n_dev}; pad "
            "with valid=False edges"
        )

    edge_spec = PoseGraphEdges(
        i=P(axis), j=P(axis),
        z=Pose(P(axis), P(axis)),
        information=P(axis), valid=P(axis),
    )

    def step(poses, edges_shard):
        H, g, chi2 = _assemble(poses, edges_shard, 0.0)
        # remove the per-shard gauge double-count: add it once after psum
        H = jax.lax.psum(H, axis)
        g = jax.lax.psum(g, axis)
        chi2 = jax.lax.psum(chi2, axis)
        H = H.at[:6, :6].add(params.gauge_weight * jnp.eye(6))
        Hd = H + params.damping * jnp.eye(6 * N, dtype=H.dtype)
        delta = -jax.scipy.linalg.solve(Hd, g, assume_a="pos")
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0).reshape(N, 6)
        new = jax.vmap(
            lambda R, t, d: se3.compose(Pose(R, t), se3.exp(d))
        )(poses.R, poses.t, delta)
        return new, chi2

    def chi2_shard(poses, edges_shard):
        _, _, c = _assemble(poses, edges_shard, 0.0)
        return jax.lax.psum(c, axis)

    sharded_step = shard_map(
        step,
        mesh=mesh,
        in_specs=(Pose(P(), P()), edge_spec),
        out_specs=(Pose(P(), P()), P()),
    )
    sharded_chi2 = shard_map(
        chi2_shard,
        mesh=mesh,
        in_specs=(Pose(P(), P()), edge_spec),
        out_specs=P(),
    )

    @jax.jit
    def run(poses, edges):
        def body(_, carry):
            p, _ = carry
            return sharded_step(p, edges)

        final, _ = jax.lax.fori_loop(
            0, params.max_iterations, body, (poses, jnp.asarray(0.0))
        )
        # chi2 AT the final poses, not the pre-update stale value
        return final, sharded_chi2(final, edges)

    return run(poses, edges)
