"""Pose-graph optimisation tests (greenfield back-end — no reference
counterpart; validated on synthetic graphs with known ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.parallel.pose_graph import (
    PoseGraphCGParams,
    PoseGraphEdges,
    PoseGraphParams,
    edge_residuals,
    optimize_pose_graph,
    optimize_pose_graph_cg,
)


def stack_poses(poses):
    return Pose(
        jnp.stack([p.R for p in poses]), jnp.stack([p.t for p in poses])
    )


def make_loop_graph(n=12, radius=5.0, odo_noise=0.05, seed=0):
    """Ground truth: poses around a circle; edges: consecutive odometry
    (noisy) + one exact loop closure."""
    rng = np.random.RandomState(seed)
    gt = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        gt.append(
            se3.from_xyz_ypr(
                radius * np.cos(ang), radius * np.sin(ang), 0.0,
                ang + np.pi / 2, 0.0, 0.0,
            )
        )
    edges_i, edges_j, zs = [], [], []
    for k in range(n - 1):
        rel = se3.compose(se3.inverse(gt[k]), gt[k + 1])
        noise = se3.exp(jnp.asarray(rng.randn(6) * odo_noise, jnp.float32))
        zs.append(se3.compose(rel, noise))
        edges_i.append(k)
        edges_j.append(k + 1)
    # loop closure n-1 -> 0, exact
    zs.append(se3.compose(se3.inverse(gt[n - 1]), gt[0]))
    edges_i.append(n - 1)
    edges_j.append(0)

    E = len(zs)
    edges = PoseGraphEdges(
        i=jnp.asarray(edges_i, jnp.int32),
        j=jnp.asarray(edges_j, jnp.int32),
        z=stack_poses(zs),
        information=jnp.tile(jnp.eye(6)[None], (E, 1, 1)),
        valid=jnp.ones(E, bool),
    )
    # initial guess: integrate noisy odometry (drifts)
    init = [gt[0]]
    for k in range(n - 1):
        init.append(se3.compose(init[-1], Pose(zs[k].R, zs[k].t)))
    return stack_poses(gt), stack_poses(init), edges


class TestEdgeResiduals:
    def test_zero_at_truth(self):
        gt, init, edges = make_loop_graph(odo_noise=0.0)
        r, Ji, Jj = edge_residuals(gt, edges)
        np.testing.assert_allclose(np.asarray(r), 0, atol=1e-4)

    def test_jacobians_vs_finite_diff(self):
        gt, init, edges = make_loop_graph(odo_noise=0.05)
        r0, Ji, Jj = edge_residuals(init, edges)
        h = 1e-4
        e = 3  # probe edge 3
        i, j = int(edges.i[e]), int(edges.j[e])
        for comp in range(6):
            d = np.zeros(6, np.float32)
            d[comp] = h
            # perturb node j
            pj = se3.compose(Pose(init.R[j], init.t[j]), se3.exp(jnp.asarray(d)))
            poses2 = Pose(
                init.R.at[j].set(pj.R), init.t.at[j].set(pj.t)
            )
            r1, _, _ = edge_residuals(poses2, edges)
            fd = (np.asarray(r1[e]) - np.asarray(r0[e])) / h
            np.testing.assert_allclose(fd, np.asarray(Jj[e])[:, comp],
                                       atol=5e-2)


class TestOptimize:
    def test_reduces_error_and_closes_loop(self):
        gt, init, edges = make_loop_graph(n=12, odo_noise=0.05)
        init_err = float(
            jnp.mean(jnp.linalg.norm(init.t - gt.t, axis=-1))
        )
        opt, chi2 = optimize_pose_graph(
            init, edges, PoseGraphParams(max_iterations=10)
        )
        opt_err = float(jnp.mean(jnp.linalg.norm(opt.t - gt.t, axis=-1)))
        assert opt_err < 0.5 * init_err
        assert np.isfinite(float(chi2))

    def test_perfect_graph_stays_put(self):
        gt, init, edges = make_loop_graph(odo_noise=0.0)
        opt, chi2 = optimize_pose_graph(gt, edges)
        np.testing.assert_allclose(np.asarray(opt.t), np.asarray(gt.t),
                                   atol=1e-3)
        assert float(chi2) < 1e-6

    def test_jit(self):
        gt, init, edges = make_loop_graph(odo_noise=0.03)
        f = jax.jit(lambda p, e: optimize_pose_graph(p, e))
        opt, chi2 = f(init, edges)
        assert np.isfinite(np.asarray(opt.t)).all()


class TestOptimizeCG:
    """Matrix-free PCG back-end — must agree with the dense solver."""

    def test_matches_dense(self):
        gt, init, edges = make_loop_graph(n=12, odo_noise=0.05)
        dense, chi2_d = optimize_pose_graph(
            init, edges, PoseGraphParams(max_iterations=10, damping=1e-4)
        )
        cg, chi2_cg = optimize_pose_graph_cg(
            init, edges,
            PoseGraphCGParams(max_iterations=10, cg_iterations=100,
                              damping=1e-4),
        )
        # chi2 agreement is the real check; translations also agree up to
        # the gauge-prior/damping null-space wiggle
        assert abs(float(chi2_cg) - float(chi2_d)) < 1e-4 * max(
            1.0, float(chi2_d)
        )
        np.testing.assert_allclose(
            np.asarray(cg.t), np.asarray(dense.t), atol=1e-2
        )

    def test_reduces_error(self):
        gt, init, edges = make_loop_graph(n=24, odo_noise=0.05, seed=3)
        init_err = float(jnp.mean(jnp.linalg.norm(init.t - gt.t, axis=-1)))
        opt, chi2 = optimize_pose_graph_cg(init, edges)
        opt_err = float(jnp.mean(jnp.linalg.norm(opt.t - gt.t, axis=-1)))
        assert opt_err < 0.6 * init_err

    def test_sharded_matches_single(self):
        from mp2p_icp_tpu.parallel.mesh import make_mesh

        gt, init, edges = make_loop_graph(n=16, odo_noise=0.05, seed=1)
        # pad edge count (16) to a multiple of 8 — already is
        assert edges.i.shape[0] % 8 == 0
        mesh = make_mesh(n_data=8, n_space=1)
        single, _ = optimize_pose_graph_cg(
            init, edges, PoseGraphCGParams(max_iterations=8)
        )
        sharded, _ = optimize_pose_graph_cg(
            init, edges, PoseGraphCGParams(max_iterations=8),
            mesh=mesh, axis="data",
        )
        np.testing.assert_allclose(
            np.asarray(sharded.t), np.asarray(single.t), atol=1e-3
        )
