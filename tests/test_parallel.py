"""Multi-device tests on the virtual 8-device CPU mesh — the category the
reference has no analogue for (SURVEY.md §4 implication)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
from mp2p_icp_tpu.parallel.batch import make_batched_align, stack_pytrees
from mp2p_icp_tpu.parallel.mesh import make_mesh
from mp2p_icp_tpu.solvers.solver import SolverHorn


def needs_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n, reason=f"needs {n} devices"
    )


def make_problem(seed, n=256):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    gt = se3.from_xyz_ypr(0.3, -0.2, 0.1, 0.05, -0.03, 0.02)
    local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
    return (
        {"raw": PointCloud.from_numpy(xyz)},
        {"raw": PointCloud.from_numpy(local)},
        gt,
    )


@needs_devices(8)
class TestShardedBatchAlign:
    def test_dp_sharded_matches_unsharded(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(n_data=4, n_space=2)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
            solvers=[SolverHorn()],
        )
        params = ICPParameters(max_iterations=8)
        B = 8
        problems = [make_problem(s) for s in range(B)]
        g_b = stack_pytrees([p[0] for p in problems])
        l_b = stack_pytrees([p[1] for p in problems])
        u_b = stack_pytrees([se3.identity() for _ in range(B)])
        fn = make_batched_align(icp, params)

        res_plain = fn(l_b, g_b, u_b)

        data_sh = NamedSharding(mesh, P("data"))
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sh)
            if hasattr(x, "ndim") and x.ndim >= 1 else x, t
        )
        with mesh:
            res_sharded = fn(put(l_b), put(g_b), put(u_b))

        np.testing.assert_allclose(
            np.asarray(res_plain.optimal_tf.t),
            np.asarray(res_sharded.optimal_tf.t),
            atol=1e-4,
        )
        # every pair recovered the same gt
        gt = problems[0][2]
        errs = jax.vmap(lambda p: se3.error_log_norm(gt, p))(
            res_sharded.optimal_tf
        )
        assert float(jnp.max(errs)) < 1e-2


@needs_devices(8)
class TestShardedPoseGraph:
    def test_sharded_matches_dense(self):
        from tests.test_pose_graph import make_loop_graph

        from mp2p_icp_tpu.parallel.pose_graph import (
            PoseGraphEdges,
            PoseGraphParams,
            optimize_pose_graph,
            optimize_pose_graph_sharded,
        )

        gt, init, edges = make_loop_graph(n=15, odo_noise=0.05)
        # pad edges to a multiple of 8 with invalid entries
        E = edges.i.shape[0]
        pad = (-E) % 8

        def pad_pose(p, n):
            return Pose(
                jnp.concatenate(
                    [p.R, jnp.tile(jnp.eye(3)[None], (n, 1, 1))]
                ),
                jnp.concatenate([p.t, jnp.zeros((n, 3))]),
            )

        edges_p = PoseGraphEdges(
            i=jnp.concatenate([edges.i, jnp.zeros(pad, jnp.int32)]),
            j=jnp.concatenate([edges.j, jnp.zeros(pad, jnp.int32)]),
            z=pad_pose(edges.z, pad),
            information=jnp.concatenate(
                [edges.information, jnp.tile(jnp.eye(6)[None], (pad, 1, 1))]
            ),
            valid=jnp.concatenate([edges.valid, jnp.zeros(pad, bool)]),
        )
        mesh = make_mesh(n_data=8, n_space=1)
        opt_dense, chi_dense = optimize_pose_graph(
            init, edges_p, PoseGraphParams(max_iterations=8)
        )
        opt_shard, chi_shard = optimize_pose_graph_sharded(
            init, edges_p, mesh, PoseGraphParams(max_iterations=8)
        )
        np.testing.assert_allclose(
            np.asarray(opt_shard.t), np.asarray(opt_dense.t), atol=1e-3
        )
        gt_err = float(jnp.mean(jnp.linalg.norm(opt_shard.t - gt.t, axis=-1)))
        init_err = float(jnp.mean(jnp.linalg.norm(init.t - gt.t, axis=-1)))
        assert gt_err < 0.5 * init_err


class TestBatchedMatchesSequential:
    """The vmapped batched align must reproduce per-pair sequential align
    results — including with a WINDOWED matcher/solver schedule, which
    exercises the schedule segmentation (icp.py _schedule_segments) under
    vmap where lax.cond gating would have executed both branches."""

    def test_windowed_schedule(self):
        from mp2p_icp_tpu.solvers.gauss_newton import GNParams
        from mp2p_icp_tpu.solvers.solver import SolverGaussNewton

        icp = ICP(
            matchers=[
                MatcherPointsDistanceThreshold(
                    threshold=1.0, run_up_to_iteration=3
                ),
                MatcherPointsDistanceThreshold(
                    threshold=0.5, run_from_iteration=4
                ),
            ],
            solvers=[
                SolverHorn(run_up_to_iteration=3),
                SolverGaussNewton(
                    run_from_iteration=4,
                    gn_params=GNParams(max_iterations=2),
                ),
            ],
        )
        params = ICPParameters(max_iterations=10)
        B = 3
        problems = [make_problem(s) for s in range(B)]
        g_b = stack_pytrees([p[0] for p in problems])
        l_b = stack_pytrees([p[1] for p in problems])
        u_b = stack_pytrees([se3.identity() for _ in range(B)])

        res_b = make_batched_align(icp, params)(l_b, g_b, u_b)

        for b, (g, l, gt) in enumerate(problems):
            res_s = icp.align(l, g, se3.identity(), params)
            np.testing.assert_allclose(
                np.asarray(res_s.optimal_tf.t),
                np.asarray(res_b.optimal_tf.t[b]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(res_s.optimal_tf.R),
                np.asarray(res_b.optimal_tf.R[b]),
                atol=1e-5,
            )
            assert int(res_s.n_iterations) == int(res_b.n_iterations[b])
            assert int(res_s.termination_reason) == int(
                res_b.termination_reason[b]
            )
            assert float(se3.error_log_norm(gt, res_s.optimal_tf)) < 1e-2

    def test_record_iterations_segmented(self):
        """The segmented lax.scan path concatenates per-segment records into
        exactly max_iterations entries, frozen after termination."""
        icp = ICP(
            matchers=[
                MatcherPointsDistanceThreshold(
                    threshold=1.0, run_up_to_iteration=2
                ),
                MatcherPointsDistanceThreshold(
                    threshold=0.8, run_from_iteration=3
                ),
            ],
            solvers=[SolverHorn()],
        )
        params = ICPParameters(max_iterations=12, record_iterations=True)
        g, l, gt = make_problem(7)
        res = icp.align(l, g, se3.identity(), params)
        assert res.iteration_poses.t.shape[0] == 12
        assert res.iteration_pair_counts.shape[0] == 12
        n = int(res.n_iterations)
        # tail frozen at the final state
        np.testing.assert_allclose(
            np.asarray(res.iteration_poses.t[n - 1]),
            np.asarray(res.iteration_poses.t[-1]),
        )
        np.testing.assert_allclose(
            np.asarray(res.iteration_poses.t[-1]),
            np.asarray(res.optimal_tf.t),
        )


class TestBroadcastGlobals:
    def test_shared_map_batch_matches_sequential(self):
        """broadcast_globals=True: B scans against ONE un-batched shared
        map (each with its own in-jit bbox crop) must equal per-scan
        sequential aligns — the multi-robot localisation pattern."""
        rng = np.random.RandomState(11)
        scene = rng.uniform(-40, 40, (4096, 3)).astype(np.float32)
        gmap = {"raw": PointCloud.from_numpy(scene, capacity=4096)}

        B = 3
        gts, locals_ = [], []
        for b in range(B):
            center = scene[rng.randint(0, scene.shape[0])]
            m = np.linalg.norm(scene - center, axis=1) < 25.0
            pts = scene[m][:512]
            gt = se3.from_xyz_ypr(
                0.3 + 0.1 * b, -0.2, 0.1, 0.04, -0.02, 0.01
            )
            loc = np.array(se3.apply(se3.inverse(gt), jnp.asarray(pts)))
            locals_.append(
                {"raw": PointCloud.from_numpy(loc, capacity=512)}
            )
            gts.append(gt)

        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=2.0)],
            solvers=[SolverHorn()],
        )
        params = ICPParameters(
            max_iterations=10, crop_capacity=2048, crop_extra_margin=2.0
        )
        l_b = stack_pytrees(locals_)
        u_b = stack_pytrees([se3.identity() for _ in range(B)])

        fn = make_batched_align(icp, params, broadcast_globals=True)
        res_b = fn(l_b, gmap, u_b)

        for b in range(B):
            res_s = icp.align(locals_[b], gmap, se3.identity(), params)
            np.testing.assert_allclose(
                np.asarray(res_s.optimal_tf.t),
                np.asarray(res_b.optimal_tf.t[b]),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(res_s.optimal_tf.R),
                np.asarray(res_b.optimal_tf.R[b]),
                atol=1e-5,
            )
            assert float(se3.error_log_norm(gts[b], res_s.optimal_tf)) < 0.05
