"""Loop closure (loop_closure.py): revisit proposal, ICP verification,
pose-graph correction — endpoint drift must shrink (VERDICT r4 Next #10)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.eval.lidar_sim import (
    make_street_scene,
    render_spinning_scan,
    scan_to_pointcloud,
)
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.loop_closure import (
    close_and_optimize,
    propose_loop_candidates,
)
from mp2p_icp_tpu.matchers.base import LayerMatch
from mp2p_icp_tpu.matchers.point2plane import MatcherPoint2Plane
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton

pytestmark = pytest.mark.slow


class TestCandidateProposal:
    def test_out_and_back_finds_revisits(self):
        n = 20
        poses = np.tile(np.eye(4), (n, 1, 1))
        # drive +x then return
        xs = list(range(10)) + list(range(9, -1, -1))
        for k, x in enumerate(xs):
            poses[k, 0, 3] = float(x)
        cands = propose_loop_candidates(
            poses, min_frame_gap=5, max_distance=0.5
        )
        assert cands, "no candidates on an out-and-back path"
        for i, j in cands:
            assert j - i >= 5
            assert abs(poses[i, 0, 3] - poses[j, 0, 3]) <= 0.5
        # greedy thinning: no frame reused
        flat = [k for ij in cands for k in ij]
        assert len(flat) == len(set(flat))

    def test_straight_line_has_none(self):
        n = 20
        poses = np.tile(np.eye(4), (n, 1, 1))
        for k in range(n):
            poses[k, 0, 3] = 2.0 * k
        assert propose_loop_candidates(poses, 5, 1.0) == []


class TestEndToEndClosure:
    def test_closure_shrinks_endpoint_drift(self):
        """Out-and-back drive with synthetic odometry drift: the
        trajectory's endpoint should coincide with a mid-sequence pose
        but drifts away; ICP-verified loop edges + the pose graph must
        pull the endpoint error down by >2x."""
        rng = np.random.RandomState(5)
        scene = make_street_scene(rng, length=80.0, n_pillars=24)
        n = 16
        xs = list(np.linspace(8, 36, 8)) + list(np.linspace(36, 8, 8))
        gt = np.tile(np.eye(4), (n, 1, 1))
        clouds = []
        dec = FilterDecimateVoxels(
            input_pointcloud_layer=("raw",),
            output_pointcloud_layer="dec",
            voxel_filter_resolution=0.4, output_capacity=4096,
        )
        for k, x in enumerate(xs):
            yaw = 0.0 if k < 8 else np.pi  # face travel direction
            p = se3.from_xyz_ypr(float(x), 0.0, 1.6, yaw, 0.0, 0.0)
            gt[k, :3, :3] = np.asarray(p.R)
            gt[k, :3, 3] = np.asarray(p.t)
            scan = render_spinning_scan(
                scene, p, np.zeros(6, np.float32), rng,
                n_rings=24, n_azimuth=256,
            )
            layers = dec({"raw": scan_to_pointcloud(scan, capacity=8192)})
            clouds.append(layers["dec"])

        # synthetic drifting odometry: systematic per-step error compounds
        drift_step = se3.from_xyz_ypr(0.06, 0.03, 0.0, 0.008, 0.0, 0.0)
        est = np.tile(np.eye(4), (n, 1, 1))
        est[0] = gt[0]
        for k in range(1, n):
            rel_gt = np.linalg.inv(gt[k - 1]) @ gt[k]
            d = np.eye(4)
            d[:3, :3] = np.asarray(drift_step.R)
            d[:3, 3] = np.asarray(drift_step.t)
            est[k] = est[k - 1] @ rel_gt @ d

        end_err_before = np.linalg.norm(est[-1, :3, 3] - gt[-1, :3, 3])
        assert end_err_before > 0.5  # the drift is material

        icp = ICP(
            matchers=[MatcherPoint2Plane(
                distance_threshold=1.5, knn=8,
                layer_matches=(LayerMatch(global_layer="dec",
                                          local_layer="dec"),),
            )],
            solvers=[SolverGaussNewton(
                gn_params=GNParams(max_iterations=3))],
        )
        out = close_and_optimize(
            icp, ICPParameters(max_iterations=25),
            clouds, est,
            min_frame_gap=6, max_distance=4.0, layer="dec",
            min_quality=0.3,
        )
        assert out["n_accepted"] >= 1, out
        end_err_after = np.linalg.norm(
            out["poses"][-1, :3, 3] - gt[-1, :3, 3]
        )
        assert end_err_after < end_err_before / 2, (
            end_err_before, end_err_after, out["loops"]
        )
        # anchor preserved
        np.testing.assert_allclose(out["poses"][0], est[0], atol=1e-5)