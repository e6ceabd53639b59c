"""Deployment-density sequence validation (VERDICT r2 Next #10).

test_sequence.py gates drift at 900-point toy scans; this module drives the
SAME closed-loop courtyard at 8192-point scans (KITTI deployment density,
scripts/kitti-run-seq.py:11-16) through apps/kitti_odometry's BATCHED path
(vmapped independent pair registrations, the TPU deployment shape), with the
same ATE/RPE gates and a loop-closure assertion.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.eval.trajectory import ate_rmse, load_kitti_poses
from mp2p_icp_tpu.io.kitti import save_kitti_bin

from tests.test_sequence import circle_pose

pytestmark = pytest.mark.slow  # quick loop: -m 'not slow'

N_FRAMES = 52
SCAN_N = 8192
SENSOR_RANGE = 18.0
NOISE = 0.02
BATCH = 8

CONFIG = """\
class_name: mp2p_icp::ICP
params:
  maxIterations: 60
  minAbsStep_trans: 1e-4
  minAbsStep_rot: 1e-4
solvers:
  - class: mp2p_icp::Solver_Horn
    params: { runFromIteration: 0, runUpToIteration: 5 }
  - class: mp2p_icp::Solver_GaussNewton
    params:
      runFromIteration: 6
      maxIterations: 3
      robustKernel: "RobustKernel::GemanMcClure"
      robustKernelParam: 0.25
matchers:
  - class: mp2p_icp::Matcher_Points_DistanceThreshold
    params:
      threshold: 2.0
      pointLayerMatches:
        - { global: "decimated", local: "decimated", weight: 1.0 }
quality:
  - class: mp2p_icp::QualityEvaluator_PairedRatio
    params: { reuse_icp_pairings: true, threshold: 0.1 }
filters:
  - class_name: mp2p_icp_filters::FilterDecimateVoxels
    params:
      output_pointcloud_layer: "decimated"
      voxel_filter_resolution: 0.3
      decimate_method: DecimateMethod::FirstPoint
"""


def make_dense_world(rng):
    """4x the courtyard density of test_sequence so every 8k scan is
    backed by enough distinct structure."""
    g = np.stack(
        [rng.uniform(-16, 16, 40000), rng.uniform(-16, 16, 40000),
         np.zeros(40000)], 1)
    walls = []
    for axis, pos in ((0, -16), (0, 16), (1, -16), (1, 16)):
        w = np.zeros((8000, 3))
        w[:, axis] = pos
        w[:, 1 - axis] = rng.uniform(-16, 16, 8000)
        w[:, 2] = rng.uniform(0, 2.5, 8000)
        walls.append(w)
    pillars = []
    for _ in range(14):
        ang, rad = rng.uniform(0, 2 * np.pi), rng.uniform(4, 14)
        c = np.array([rad * np.cos(ang), rad * np.sin(ang)])
        th = rng.uniform(0, 2 * np.pi, 1500)
        pillars.append(np.stack(
            [c[0] + 0.3 * np.cos(th), c[1] + 0.3 * np.sin(th),
             rng.uniform(0, 2.5, 1500)], 1))
    return np.concatenate([g] + walls + pillars).astype(np.float32)


def render_dense_scan(world, pose, rng):
    t = np.asarray(pose.t)
    d = np.linalg.norm(world[:, :2] - t[None, :2], axis=1)
    cand = np.where(d < SENSOR_RANGE)[0]
    sel = rng.choice(cand, SCAN_N, replace=len(cand) < SCAN_N)
    local = np.asarray(
        se3.apply(se3.inverse(pose), jnp.asarray(world[sel]))
    )
    return (local + NOISE * rng.randn(SCAN_N, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def dense_sequence(tmp_path_factory):
    from mp2p_icp_tpu.apps.kitti_odometry import run_sequence

    rng = np.random.RandomState(21)
    world = make_dense_world(rng)
    root = tmp_path_factory.mktemp("denseseq")
    bin_dir = root / "velodyne"
    bin_dir.mkdir()
    gt_mats = []
    for i in range(N_FRAMES):
        pose = circle_pose(2 * np.pi * i / N_FRAMES)
        scan = render_dense_scan(world, pose, rng)
        save_kitti_bin(
            str(bin_dir / f"{i:06d}.bin"),
            PointCloud.from_numpy(scan, capacity=SCAN_N),
        )
        T = np.eye(4)
        T[:3, :3] = np.asarray(pose.R)
        T[:3, 3] = np.asarray(pose.t)
        gt_mats.append(T)
    gt = np.stack(gt_mats)
    np.savetxt(str(root / "gt.txt"), gt[:, :3, :].reshape(-1, 12))
    cfg = root / "icp.yaml"
    cfg.write_text(CONFIG)

    paths = sorted(bin_dir.glob("*.bin"))
    assert len(paths) == N_FRAMES
    out = run_sequence(
        paths, str(cfg),
        gt_poses=load_kitti_poses(str(root / "gt.txt")),
        verbose=False,
        batch_size=BATCH,  # the vmapped deployment path
    )
    return {"out": out, "gt": gt, "cfg": str(cfg), "paths": paths}


class TestDenseOdometrySequence:
    def test_batched_ate_rpe_gates(self, dense_sequence):
        out = dense_sequence["out"]
        assert out["n_frames"] == N_FRAMES
        assert out["ate_rmse"] < 0.5, out["ate_rmse"]
        assert out["rpe_trans"] < 0.05, out["rpe_trans"]
        assert out["rpe_rot"] < 0.01, out["rpe_rot"]
        assert out["scans_per_s"] > 0

    def test_loop_closure_shrinks_drift(self, dense_sequence):
        from mp2p_icp_tpu.filters import apply_filter_pipeline
        from mp2p_icp_tpu.io.kitti import load_kitti_bin
        from mp2p_icp_tpu.parallel.pose_graph import (
            PoseGraphEdges,
            PoseGraphParams,
            optimize_pose_graph,
        )
        from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

        est = dense_sequence["out"]["poses"]
        gt = dense_sequence["gt"]
        N = est.shape[0]

        icp, params, sections = load_icp_config_file(dense_sequence["cfg"])
        filters = sections.get("filters", [])

        def prep(path):
            pc = load_kitti_bin(str(path), capacity=SCAN_N)
            return apply_filter_pipeline(filters, {"raw": pc})

        first = prep(dense_sequence["paths"][0])
        last = prep(dense_sequence["paths"][-1])
        guess_mat = np.linalg.inv(est[0]) @ est[-1]
        guess = se3.Pose(
            R=jnp.asarray(guess_mat[:3, :3], jnp.float32),
            t=jnp.asarray(guess_mat[:3, 3], jnp.float32),
        )
        res = icp.align(last, first, guess, params)
        assert float(res.quality) > 0.3

        z_loop = res.optimal_tf
        gt_rel = np.linalg.inv(gt[0]) @ gt[-1]
        gt_loop = se3.Pose(
            R=jnp.asarray(gt_rel[:3, :3], jnp.float32),
            t=jnp.asarray(gt_rel[:3, 3], jnp.float32),
        )
        assert float(se3.error_log_norm(gt_loop, z_loop)) < 0.05

        rel_mats = [np.linalg.inv(est[i]) @ est[i + 1] for i in range(N - 1)]
        i_idx = list(range(N - 1)) + [0]
        j_idx = list(range(1, N)) + [N - 1]
        zR = np.stack([m[:3, :3] for m in rel_mats] + [np.asarray(z_loop.R)])
        zt = np.stack([m[:3, 3] for m in rel_mats] + [np.asarray(z_loop.t)])
        E = len(i_idx)
        edges = PoseGraphEdges(
            i=jnp.asarray(i_idx, jnp.int32),
            j=jnp.asarray(j_idx, jnp.int32),
            z=se3.Pose(R=jnp.asarray(zR, jnp.float32),
                       t=jnp.asarray(zt, jnp.float32)),
            information=jnp.tile(jnp.eye(6)[None], (E, 1, 1)),
            valid=jnp.ones((E,), bool),
        )
        init = se3.Pose(
            R=jnp.asarray(est[:, :3, :3], jnp.float32),
            t=jnp.asarray(est[:, :3, 3], jnp.float32),
        )
        opt, chi2 = optimize_pose_graph(
            init, edges, PoseGraphParams(max_iterations=10)
        )
        opt_mats = np.tile(np.eye(4), (N, 1, 1))
        opt_mats[:, :3, :3] = np.asarray(opt.R)
        opt_mats[:, :3, 3] = np.asarray(opt.t)

        def endpoint_err(traj):
            rel = np.linalg.inv(traj[0]) @ traj[-1]
            return np.linalg.norm(rel[:3, 3] - gt_rel[:3, 3])

        e_before = endpoint_err(est)
        e_after = endpoint_err(opt_mats)
        ate_before = ate_rmse(est, gt)
        ate_after = ate_rmse(opt_mats, gt)
        assert np.isfinite(float(chi2))
        assert e_after < max(0.6 * e_before, 0.03), (e_before, e_after)
        assert ate_after < max(ate_before, 0.05) + 1e-6, (
            ate_before, ate_after)
        assert ate_after < 0.25, ate_after
