"""Trajectory metrics + KITTI odometry harness tests."""

import numpy as np

from mp2p_icp_tpu.eval.trajectory import (
    ate_rmse,
    load_kitti_poses,
    rpe,
    save_kitti_poses,
    umeyama_align,
)


def circle_traj(n=50, radius=10.0):
    out = np.tile(np.eye(4), (n, 1, 1))
    for k in range(n):
        a = 2 * np.pi * k / n
        out[k, :3, 3] = [radius * np.cos(a), radius * np.sin(a), 0]
        c, s = np.cos(a), np.sin(a)
        out[k, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return out


class TestMetrics:
    def test_ate_zero_for_identical(self):
        t = circle_traj()
        assert ate_rmse(t, t) < 1e-9

    def test_ate_invariant_to_rigid_offset(self):
        t = circle_traj()
        T = np.eye(4)
        T[:3, 3] = [100, -50, 3]
        moved = np.einsum("ij,njk->nik", T, t)
        assert ate_rmse(moved, t, align=True) < 1e-6
        assert ate_rmse(moved, t, align=False) > 50

    def test_ate_detects_drift(self):
        t = circle_traj()
        drifted = t.copy()
        drifted[:, 0, 3] += np.linspace(0, 5, len(t))
        assert 0.5 < ate_rmse(drifted, t) < 5.0

    def test_rpe(self):
        t = circle_traj()
        tr, rr = rpe(t, t)
        assert tr < 1e-9 and rr < 1e-6
        noisy = t.copy()
        noisy[:, :3, 3] += np.random.RandomState(0).randn(len(t), 3) * 0.01
        tr, rr = rpe(noisy, t)
        assert 0.005 < tr < 0.1

    def test_umeyama(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(30, 3)
        Rgt = np.linalg.qr(rng.randn(3, 3))[0]
        if np.linalg.det(Rgt) < 0:
            Rgt[:, 0] *= -1
        tgt = np.array([1.0, -2.0, 3.0])
        moved = pts @ Rgt.T + tgt
        R, t, s = umeyama_align(pts, moved)
        np.testing.assert_allclose(R, Rgt, atol=1e-6)
        np.testing.assert_allclose(t, tgt, atol=1e-6)

    def test_kitti_pose_io(self, tmp_path):
        t = circle_traj(10)
        p = str(tmp_path / "poses.txt")
        save_kitti_poses(p, t)
        t2 = load_kitti_poses(p)
        np.testing.assert_allclose(t2, t, atol=1e-7)


class TestKittiOdometryHarness:
    def test_synthetic_sequence(self, tmp_path):
        """Full harness on a synthetic 5-frame 'KITTI' sequence with known
        motion; ATE must be small (configs[2] analogue at toy scale)."""
        import jax.numpy as jnp

        from mp2p_icp_tpu.apps.kitti_odometry import run_sequence
        from mp2p_icp_tpu.core import se3
        from mp2p_icp_tpu.eval.trajectory import poses_from_se3

        rng = np.random.RandomState(0)
        n_pts = 4000
        world = np.concatenate(
            [
                np.stack(
                    [rng.uniform(-40, 40, n_pts // 2),
                     rng.uniform(-40, 40, n_pts // 2),
                     rng.normal(0, 0.05, n_pts // 2)], 1),
                np.stack(
                    [rng.uniform(-40, 40, n_pts // 2),
                     rng.choice([-12.0, -6.0, 6.0, 12.0], n_pts // 2)
                     + rng.normal(0, 0.1, n_pts // 2),
                     rng.uniform(0, 4, n_pts // 2)], 1),
            ]
        ).astype(np.float32)

        gt_poses = []
        paths = []
        for k in range(5):
            pose = se3.from_xyz_ypr(1.0 * k, 0.02 * k, 0.0, 0.01 * k, 0, 0)
            gt_poses.append(pose)
            scan = np.array(
                se3.apply(se3.inverse(pose), jnp.asarray(world))
            )
            raw = np.concatenate(
                [scan, np.zeros((n_pts, 1), np.float32)], axis=1
            )
            p = tmp_path / f"{k:06d}.bin"
            raw.astype(np.float32).tofile(p)
            paths.append(p)

        import yaml as _yaml

        cfg = tmp_path / "icp.yaml"
        cfg.write_text(
            _yaml.safe_dump(
                {
                    "class_name": "mp2p_icp::ICP",
                    "params": {"maxIterations": 40},
                    "solvers": [
                        {"class": "mp2p_icp::Solver_Horn", "params": {}},
                    ],
                    "matchers": [
                        {
                            "class": "mp2p_icp::Matcher_Points_DistanceThreshold",
                            "params": {
                                "threshold": 2.0,
                                "pointLayerMatches": [
                                    {"global": "decimated",
                                     "local": "decimated", "weight": 1.0}
                                ],
                            },
                        }
                    ],
                    "quality": [
                        {
                            "class": "mp2p_icp::QualityEvaluator_PairedRatio",
                            "params": {},
                        }
                    ],
                    "filters": [
                        {
                            "class_name": "mp2p_icp_filters::FilterDecimateVoxels",
                            "params": {
                                "output_pointcloud_layer": "decimated",
                                "voxel_filter_resolution": 1.5,
                            },
                        }
                    ],
                }
            )
        )
        out = run_sequence(paths, str(cfg), verbose=False)
        est = out["poses"]
        gt = poses_from_se3(gt_poses)
        err = ate_rmse(est, gt, align=False)
        assert err < 0.1, f"ATE={err}"
