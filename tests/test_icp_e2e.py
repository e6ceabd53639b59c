"""End-to-end ICP integration tests on real scans.

Mirrors the reference's tests/test-mp2p_icp_algos.cpp (category 3 in
SURVEY.md §4): Stanford bunny (+ happy buddha), decimation x10, random
perturbation within +/-15% bbox and +/-10 deg per axis, the full
{Horn, OLAE, GaussNewton} x {DistanceThreshold, InlierRatio} matrix, and
the hard bound ||log SE3(gt^-1 est)|| < 0.1 (reference :223).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.icp import ICP, ICPParameters, IterTermReason
from mp2p_icp_tpu.io.xyz import load_xyz_file
from mp2p_icp_tpu.matchers import (
    MatcherPointsDistanceThreshold,
    MatcherPointsInlierRatio,
)
from mp2p_icp_tpu.quality.paired_ratio import QualityPairedRatio
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn, SolverOLAE

BUNNY = "/root/reference/demos/bunny_decim.xyz.gz"
BUDDHA = "/root/reference/demos/happy_buddha_decim.xyz.gz"


def random_gt(rng, bbox_size, f=0.15, max_deg=10.0):
    d = rng.uniform(-f * bbox_size, f * bbox_size)
    ang = np.deg2rad(rng.uniform(-max_deg, max_deg, 3))
    return se3.from_xyz_ypr(d[0], d[1], d[2], ang[0], ang[1], ang[2])


def make_pair(path, rng, decimation=10):
    """(local, global, gt): local = global displaced by gt^-1 so that
    aligning local onto global recovers gt (reference test setup)."""
    pc = load_xyz_file(path, decimation=decimation)
    xyz = pc.to_numpy()
    bbox_size = xyz.max(0) - xyz.min(0)
    gt = random_gt(rng, bbox_size)
    local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
    from mp2p_icp_tpu.core.pointcloud import PointCloud

    local = {"raw": PointCloud.from_numpy(local_xyz)}
    globl = {"raw": pc}
    return local, globl, gt


SOLVERS = {
    "horn": SolverHorn(),
    "olae": SolverOLAE(),
    "gn": SolverGaussNewton(gn_params=GNParams(max_iterations=3)),
}
MATCHERS = {
    "dist": MatcherPointsDistanceThreshold(threshold=0.50, k_per_cell=64),
    "inlier": MatcherPointsInlierRatio(
        inliers_ratio=0.8, search_radius_hint=0.5, k_per_cell=64
    ),
}


class TestICPMatrix:
    # >=3 independent perturbation draws per {solver x matcher} cell at
    # the reference's strength (+-15% bbox / +-10 deg — random_gt;
    # reference: test-mp2p_icp_algos.cpp:242-262 runs multiple reps).
    # Rep 0 stays in the quick tier; extra reps are `slow`.
    @pytest.mark.parametrize("rep", [
        0,
        pytest.param(1, marks=pytest.mark.slow),
        pytest.param(2, marks=pytest.mark.slow),
    ])
    @pytest.mark.parametrize("solver", ["horn", "olae", "gn"])
    @pytest.mark.parametrize("matcher", ["dist", "inlier"])
    def test_bunny(self, solver, matcher, rep):
        rng = np.random.RandomState(1234 + 7919 * rep)
        local, globl, gt = make_pair(BUNNY, rng)
        icp = ICP(
            matchers=[MATCHERS[matcher]],
            solvers=[SOLVERS[solver]],
            quality_evaluators=[QualityPairedRatio()],
        )
        res = icp.align(
            local, globl, se3.identity(), ICPParameters(max_iterations=100)
        )
        err = float(se3.error_log_norm(gt, res.optimal_tf))
        assert err < 0.1, (
            f"{solver}/{matcher}: err={err:.4f} "
            f"iters={int(res.n_iterations)} reason={int(res.termination_reason)}"
        )
        assert float(res.quality) > 0.5

    @pytest.mark.parametrize("rep", [
        0,
        pytest.param(1, marks=pytest.mark.slow),
        pytest.param(2, marks=pytest.mark.slow),
    ])
    def test_buddha_horn_dist(self, rep):
        rng = np.random.RandomState(99 + 7919 * rep)
        local, globl, gt = make_pair(BUDDHA, rng)
        icp = ICP(matchers=[MATCHERS["dist"]], solvers=[SOLVERS["horn"]])
        res = icp.align(
            local, globl, se3.identity(), ICPParameters(max_iterations=100)
        )
        assert float(se3.error_log_norm(gt, res.optimal_tf)) < 0.1


class TestICPBehaviour:
    def test_solver_schedule_switch(self):
        # KITTI-style schedule: Horn iters 0-5, GN from 6
        rng = np.random.RandomState(7)
        local, globl, gt = make_pair(BUNNY, rng)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.5, k_per_cell=64)],
            solvers=[
                SolverHorn(run_from_iteration=0, run_up_to_iteration=5),
                SolverGaussNewton(run_from_iteration=6),
            ],
        )
        res = icp.align(local, globl, se3.identity(),
                        ICPParameters(max_iterations=60))
        assert float(se3.error_log_norm(gt, res.optimal_tf)) < 0.1

    def test_no_pairings_termination(self):
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        g = {"raw": PointCloud.from_numpy(np.zeros((4, 3), np.float32))}
        l = {
            "raw": PointCloud.from_numpy(
                np.full((4, 3), 100.0, np.float32)
            )
        }
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.1)],
            solvers=[SolverHorn()],
        )
        res = icp.align(g_map := g, l_map := l, se3.identity())
        # maps 100m apart, threshold 0.1 -> no pairings at iter 0
        assert int(res.termination_reason) == int(IterTermReason.NO_PAIRINGS)
        assert int(res.n_iterations) == 1
        # pose unchanged from guess
        np.testing.assert_allclose(res.optimal_tf.t, 0, atol=0)

    def test_stall_termination_and_covariance(self):
        rng = np.random.RandomState(3)
        local, globl, gt = make_pair(BUNNY, rng)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.5, k_per_cell=64)],
            solvers=[SolverHorn()],
        )
        res = icp.align(local, globl, se3.identity(),
                        ICPParameters(max_iterations=100))
        assert int(res.termination_reason) in (
            int(IterTermReason.STALLED),
            int(IterTermReason.MAX_ITERATIONS),
        )
        cov = np.asarray(res.covariance)
        assert cov.shape == (6, 6)
        assert np.isfinite(cov).all()
        # converged registration on 1k points: bounded uncertainty (the
        # rotation information scales with sum |l|^2 ~ 1000 * 0.01 for the
        # 0.15 m bunny, so diag(cov) ~ 0.1 at most)
        assert (np.diag(cov) < 1.0).all()
        # positive semidefinite-ish: diagonal positive
        assert (np.diag(cov) > 0).all()

    def test_quality_checkpoint_aborts_bad_runs(self):
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        rng = np.random.RandomState(5)
        # unrelated clouds: pairing ratio ~ 0 at checkpoint -> abort
        g = {"raw": PointCloud.from_numpy(rng.uniform(-1, 1, (256, 3)))}
        l = {"raw": PointCloud.from_numpy(rng.uniform(50, 52, (256, 3)) )}
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.3)],
            solvers=[SolverHorn()],
        )
        res = icp.align(l, g, se3.identity(),
                        ICPParameters(max_iterations=100,
                                      quality_checkpoints=((2, 0.05),)))
        assert int(res.termination_reason) in (
            int(IterTermReason.NO_PAIRINGS),
            int(IterTermReason.QUALITY_CHECKPOINT_FAILED),
        )

    def test_checkpoint_runs_configured_evaluator_stack(self):
        """The checkpoint evaluates the CONFIGURED quality evaluators
        (reference: ICP.cpp:259-283 runs the full quality_evaluators_
        stack), not the in-loop pairing ratio: here the point clouds
        match perfectly (pairing ratio ~1, the old shortcut would pass)
        but the attached QualityVoxels layers DISAGREE — the run must
        abort with QUALITY_CHECKPOINT_FAILED at the checkpoint."""
        from mp2p_icp_tpu.core.metric_map import VoxelGridLayer
        from mp2p_icp_tpu.core.pointcloud import PointCloud
        from mp2p_icp_tpu.filters.voxel_filters import update_voxel_map
        from mp2p_icp_tpu.quality.voxels import QualityVoxels

        rng = np.random.RandomState(6)
        local, globl, _gt = make_pair(BUNNY, rng)
        pts = jnp.asarray(np.asarray(globl["raw"].xyz[:256]))
        vg_g = update_voxel_map(
            VoxelGridLayer.empty(4096, 0.05), pts,
            jnp.ones(256, bool), jnp.zeros(3), carve_free_space=False,
        )
        far = pts + 40.0  # disjoint voxel set
        vg_l_bad = update_voxel_map(
            VoxelGridLayer.empty(4096, 0.05), far,
            jnp.ones(256, bool), jnp.zeros(3), carve_free_space=False,
        )
        qv = QualityVoxels(voxel_layer_name="vox")
        q_bad = float(qv.evaluate_voxels(vg_l_bad, vg_g, se3.identity()).quality)
        q_good = float(qv.evaluate_voxels(vg_g, vg_g, se3.identity()).quality)
        assert q_bad < q_good
        thr = 0.5 * (q_bad + q_good)

        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.5)],
            solvers=[SolverHorn()],
            quality_evaluators=[QualityVoxels(voxel_layer_name="vox")],
        )
        res = icp.align(
            {**local, "vox": vg_l_bad},
            {**globl, "vox": vg_g},
            se3.identity(),
            ICPParameters(max_iterations=40,
                          quality_checkpoints=((2, thr),)),
        )
        assert int(res.termination_reason) == int(
            IterTermReason.QUALITY_CHECKPOINT_FAILED
        ), int(res.termination_reason)
        assert int(res.n_iterations) == 3  # aborted right at the checkpoint

        # control: agreeing voxel layers pass the same checkpoint
        res2 = icp.align(
            {**local, "vox": vg_g},
            {**globl, "vox": vg_g},
            se3.identity(),
            ICPParameters(max_iterations=40,
                          quality_checkpoints=((2, thr),)),
        )
        assert int(res2.termination_reason) != int(
            IterTermReason.QUALITY_CHECKPOINT_FAILED
        )
        assert int(res2.n_iterations) > 3


class TestRecordIterations:
    def test_per_iteration_trace(self):
        rng = np.random.RandomState(17)
        local, globl, gt = make_pair(BUNNY, rng)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.5)],
            solvers=[SOLVERS["horn"]],
        )
        params = ICPParameters(max_iterations=20, record_iterations=True)
        res = icp.align(local, globl, se3.identity(), params)
        assert res.iteration_poses is not None
        assert res.iteration_poses.t.shape == (20, 3)
        assert res.iteration_pair_counts.shape == (20,)
        # error decreases from first iteration to final
        errs = [
            float(se3.error_log_norm(gt, se3.Pose(
                res.iteration_poses.R[i], res.iteration_poses.t[i])))
            for i in range(20)
        ]
        assert errs[-1] < 0.1
        assert errs[-1] <= errs[0]
        # recorded tail repeats the converged pose
        n = int(res.n_iterations)
        if n < 20:
            np.testing.assert_allclose(
                res.iteration_poses.t[n - 1], res.iteration_poses.t[-1],
                atol=1e-6,
            )
        # and matches the headline result
        np.testing.assert_allclose(
            res.iteration_poses.t[-1], res.optimal_tf.t, atol=1e-6
        )

    def test_per_iteration_pairings(self, tmp_path):
        """record_pairings: a capacity-bounded per-iteration Pairings
        snapshot for icp-log-viewer playback (reference: LogRecord.h:58-71,
        ICP.cpp:232-241)."""
        rng = np.random.RandomState(18)
        local, globl, gt = make_pair(BUNNY, rng)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=0.5)],
            solvers=[SOLVERS["horn"]],
        )
        K = 64
        params = ICPParameters(
            max_iterations=12,
            record_iterations=True,
            record_pairings=True,
            record_pairings_capacity=K,
        )
        res = icp.align(local, globl, se3.identity(), params)
        ip = res.iteration_pairings
        assert ip is not None
        assert ip.pt2pt.local.shape == (12, K, 3)
        assert ip.pt2pt.weight.shape == (12, K)
        counts = np.asarray(res.iteration_pair_counts)
        w = np.asarray(ip.pt2pt.weight)
        for i in range(12):
            rec = int((w[i] > 0).sum())
            # recorded pairs = min(K, total) within stride rounding
            assert rec <= K
            assert rec <= int(counts[i])
            if counts[i] > 0:
                assert rec >= min(K, int(counts[i])) // 2
        # recorded pairs are REAL correspondences: at the final pose the
        # residuals of the last iteration's pairs are small
        from mp2p_icp_tpu.core import se3 as _se3
        import jax.numpy as jnp

        sel = w[-1] > 0
        loc = np.array(
            _se3.apply(res.optimal_tf, jnp.asarray(ip.pt2pt.local[-1]))
        )
        d = np.linalg.norm(
            loc[sel] - np.asarray(ip.pt2pt.globl[-1])[sel], axis=1
        )
        assert d.mean() < 0.1

        # icplog round-trip + viewer render of an iteration frame
        from mp2p_icp_tpu.apps.icp_log_viewer import main as viewer_main
        from mp2p_icp_tpu.io.icplog import load_log, save_log

        p = str(tmp_path / "run.icplog.npz")
        save_log(p, local, globl, se3.identity(), res)
        log = load_log(p)
        assert "pairings" in log["iterations"]
        np.testing.assert_allclose(
            np.asarray(log["iterations"]["pairings"].pt2pt.weight), w
        )
        prefix = str(tmp_path / "view")
        assert viewer_main([p, "-o", prefix, "-i", "3"]) == 0
        import os

        assert os.path.exists(prefix + "_iter003.png")


class TestRunUntilTranslationCorrectionGate:
    """runUntilTranslationCorrectionSmallerThan semantics (Solver.cpp:44-60):
    the solver RUNS while the last ICP step increment is unset (iteration 0)
    or >= threshold, and latches off PERMANENTLY once an increment falls
    below it. The previous implementation gated on distance-from-guess,
    which inverted the handoff (off at iteration 0, on forever after)."""

    def test_solver_runs_first_iteration_then_latches(self):
        """thr larger than any possible step: the solver must run exactly
        once (iteration 0, increment unset) and latch at iteration 1.
        One Horn step on NN correspondences gets partway to the truth, so
        the final error must be well below the initial offset (solver ran
        — the old gate left pose == guess) but well above a converged run
        (the latch stopped further iterations)."""
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        rng = np.random.RandomState(0)
        xyz = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        gt = se3.from_xyz_ypr(0.3, -0.1, 0.05, 0.02, 0.0, -0.01)
        local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
        local = {"raw": PointCloud.from_numpy(local_xyz)}
        globl = {"raw": PointCloud.from_numpy(xyz)}

        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
            solvers=[
                SolverHorn(run_until_translation_correction_smaller_than=100.0)
            ],
            quality_evaluators=[QualityPairedRatio()],
        )
        res = icp.align(local, globl, se3.identity(),
                        ICPParameters(max_iterations=10))
        err = float(se3.error_log_norm(gt, res.optimal_tf))
        err0 = float(se3.error_log_norm(gt, se3.identity()))
        # old gate: solver never ran -> err == err0 (~0.32); unlatched:
        # 10 iterations would converge to < 0.02
        assert err < 0.6 * err0, (err, err0)
        assert err > 0.02, err

    def test_coarse_to_fine_handoff_converges(self):
        """Horn-until-small-steps + GN: the latch hands off to GN and the
        pipeline still converges fully."""
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        rng = np.random.RandomState(1)
        xyz = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        gt = se3.from_xyz_ypr(0.25, 0.1, -0.05, 0.01, -0.02, 0.03)
        local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
        local = {"raw": PointCloud.from_numpy(local_xyz)}
        globl = {"raw": PointCloud.from_numpy(xyz)}

        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
            solvers=[
                SolverHorn(run_until_translation_correction_smaller_than=0.05),
                SolverGaussNewton(gn_params=GNParams(max_iterations=3)),
            ],
            quality_evaluators=[QualityPairedRatio()],
        )
        res = icp.align(local, globl, se3.identity(),
                        ICPParameters(max_iterations=25))
        err = float(se3.error_log_norm(gt, res.optimal_tf))
        assert err < 0.01, err
