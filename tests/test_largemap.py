"""Scan-to-LARGE-map registration (VERDICT r1 Missing #1).

The reference's raison d'être: matching a scan against an accumulated
metric map of 1M+ points via lazy KD-trees
(mp2p_icp_map/src/metricmap.cpp:784-802). The TPU path is (a) bbox
crop-compaction of the global map at the guess pose (icp._crop_globals)
plus (b) HBM-streamed superblock NN for anything still above the VMEM
budget (ops.nn_bruteforce streamed paths). These tests cover both layers:
exactness of the streamed kNN vs the resident kernel, and an end-to-end
multi-keyframe FilterMerge map registration with the reference's
``|log SE3 err| < 0.1`` bound (tests/test-mp2p_icp_algos.cpp:223).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

pytestmark = pytest.mark.slow  # quick loop: -m 'not slow'


# ---------------------------------------------------------- streamed kNN
class TestStreamedKnn:
    @pytest.mark.parametrize("k", [1, 3])
    def test_streamed_matches_resident(self, k):
        rng = np.random.RandomState(3)
        Q, C = 300, 5000
        q = rng.uniform(-50, 50, (Q, 3)).astype(np.float32)
        p = rng.uniform(-50, 50, (C, 3)).astype(np.float32)
        qv = jnp.arange(Q) < Q - 7
        pv = jnp.arange(C) < C - 13
        ref = knn_bruteforce(q, qv, p, pv, k=k, backend="xla",
                             stream_block=1 << 30)
        got = knn_bruteforce(q, qv, p, pv, k=k, backend="xla",
                             stream_block=512)
        np.testing.assert_array_equal(np.array(ref.valid), np.array(got.valid))
        # |p|^2 - 2q.p cancels ~|p|^2*2^-22 of f32 noise, and that noise
        # depends on the matmul block shape — near-ties may resolve to a
        # different neighbour. Compare distances, not identity.
        np.testing.assert_allclose(
            np.array(ref.dist_sq), np.array(got.dist_sq), atol=5e-3
        )
        d_ref = np.array(ref.dist_sq)[np.array(ref.valid)]
        d_got = np.array(got.dist_sq)[np.array(got.valid)]
        np.testing.assert_allclose(np.sort(d_ref), np.sort(d_got), atol=5e-3)

    def test_streamed_pallas_interpret_matches_xla(self):
        rng = np.random.RandomState(4)
        Q, C = 64, 1500
        q = rng.uniform(-20, 20, (Q, 3)).astype(np.float32)
        p = rng.uniform(-20, 20, (C, 3)).astype(np.float32)
        qv = jnp.ones((Q,), bool)
        pv = jnp.ones((C,), bool)
        ref = knn_bruteforce(q, qv, p, pv, k=1, backend="xla")
        got = knn_bruteforce(q, qv, p, pv, k=1, backend="pallas",
                             interpret=True, stream_block=512)
        np.testing.assert_array_equal(np.array(ref.idx), np.array(got.idx))
        np.testing.assert_allclose(
            np.array(ref.dist_sq), np.array(got.dist_sq), rtol=1e-3, atol=1e-2
        )

    def test_streamed_radius_and_validity(self):
        rng = np.random.RandomState(5)
        q = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        p = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
        qv = jnp.ones((100,), bool)
        pv = jnp.ones((2000,), bool)
        r = knn_bruteforce(q, qv, p, pv, k=1, max_radius_sq=0.04,
                           backend="xla", stream_block=256)
        d = np.array(r.dist_sq)[np.array(r.valid)]
        assert np.all(d < 0.04)
        assert np.all(np.array(r.idx)[~np.array(r.valid)] == -1)


# ----------------------------------------------------------- crop + align
def _corridor_scene(rng, n, length=400.0):
    """A long corridor: ground + two walls + boxes — structured so every
    SE(3) axis is constrained locally."""
    t = rng.uniform(0, length, n)
    kind = rng.randint(0, 4, n)
    y = np.where(kind == 0, -6.0, np.where(kind == 1, 6.0,
                 rng.uniform(-6, 6, n)))
    z = np.where(kind < 2, rng.uniform(0, 4, n),
                 np.where(kind == 2, 0.02 * rng.randn(n),
                          rng.uniform(0, 2.5, n)))
    # boxes every 25 m give x-constraints
    xq = np.where(kind == 3, np.round(t / 25.0) * 25.0 + 0.15 * rng.randn(n), t)
    return np.stack([xq, y, z], 1).astype(np.float32)


def _local_view(scene, center_x, rng, n=4096, radius=40.0, noise=0.01):
    """Independently re-sample the scene near center_x (partial overlap with
    any other view) + per-scan sensor noise."""
    m = np.abs(scene[:, 0] - center_x) < radius
    pts = scene[m]
    idx = rng.choice(pts.shape[0], size=min(n, pts.shape[0]), replace=False)
    return (pts[idx] + noise * rng.randn(idx.shape[0], 3)).astype(np.float32)


class TestScanToLargeMap:
    def test_register_scan_against_million_point_map(self):
        """FilterMerge ~50 keyframes into a >=1M-point global map, then
        register fresh scans against it through the crop path."""
        from mp2p_icp_tpu.filters.merge import FilterMerge

        rng = np.random.RandomState(11)
        scene = _corridor_scene(rng, 3_000_000)

        # build the map: 50 keyframes of ~21k points merged into one layer
        merge = FilterMerge(input_pointcloud_layer="kf", target_layer="map",
                            target_capacity=1 << 20, use_robot_pose=False)
        layers = {}
        for i in range(50):
            kf = _local_view(scene, 4.0 + 8.0 * i, rng, n=21000, radius=30.0)
            layers["kf"] = PointCloud.from_numpy(kf, capacity=1 << 15)
            layers = merge(layers)
        gmap = layers["map"]
        assert int(gmap.count) >= 1_000_000
        assert gmap.capacity == 1 << 20

        from mp2p_icp_tpu.matchers.base import LayerMatch

        lm = (LayerMatch(global_layer="map", local_layer="raw"),)
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(
                threshold=2.0, layer_matches=lm)],
            solvers=[
                SolverHorn(run_up_to_iteration=5),
                SolverGaussNewton(run_from_iteration=6,
                                  gn_params=GNParams(max_iterations=3)),
            ],
        )
        # 60-iteration budget: real partially-overlapping pairs need far
        # more than the rigid-clone toy problems (reference demo configs
        # run 100-200, demos/icp-settings-kitti.yaml:13)
        params = ICPParameters(
            max_iterations=60, crop_capacity=1 << 16, crop_extra_margin=4.0
        )

        for cx, seed in [(120.0, 21), (250.0, 22)]:
            scan = _local_view(scene, cx, np.random.RandomState(seed),
                               n=4096, radius=35.0)
            # SENSOR-FRAME local scan (as in the reference: local maps are
            # sensor-centred; the world pose rides in the guess). A world-
            # frame "local" cloud at x~250 would give the guess's rotation
            # error a 250 m lever arm and sweep the scene out of any crop.
            sensor = se3.from_xyz_ypr(cx, 0.0, 1.5, 0.0, 0.0, 0.0)
            gt_err = se3.from_xyz_ypr(0.8, 0.3, 0.05, 0.03, 0.005, -0.01)
            gt_pose = se3.compose(sensor, gt_err)  # true sensor pose
            local = np.array(
                se3.apply(se3.inverse(gt_pose), jnp.asarray(scan))
            )
            res = icp.align(
                {"raw": PointCloud.from_numpy(local, capacity=4096)},
                {"map": gmap},
                sensor,  # guess = odometry-prior pose, off by gt_err
                params,
            )
            err = float(se3.error_log_norm(gt_pose, res.optimal_tf))
            assert err < 0.1, f"center {cx}: err {err}"

    def test_crop_disabled_matches_crop_enabled(self):
        """Cropping must not change the answer when the guess is sane."""
        rng = np.random.RandomState(13)
        scene = _corridor_scene(rng, 400_000, length=120.0)
        gmap = PointCloud.from_numpy(
            _local_view(scene, 60.0, rng, n=140_000, radius=60.0),
            capacity=1 << 18,
        )
        scan = _local_view(scene, 60.0, np.random.RandomState(7), n=2048,
                           radius=30.0)
        gt = se3.from_xyz_ypr(0.4, -0.2, 0.02, 0.02, 0.0, 0.01)
        local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(scan)))
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=2048)}
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.5)],
            solvers=[SolverHorn()],
        )
        # crop_capacity > in-box count: no stride decimation, so the crop
        # keeps every candidate the matcher could reach (threshold 1.5 <<
        # margin) and the answer must match the uncropped run tightly
        p_on = ICPParameters(max_iterations=60, crop_capacity=1 << 17)
        p_off = ICPParameters(max_iterations=60, crop_to_local_bbox=False)
        r_on = icp.align(l_layers, {"raw": gmap}, se3.identity(), p_on)
        r_off = icp.align(l_layers, {"raw": gmap}, se3.identity(), p_off)
        e_on = float(se3.error_log_norm(gt, r_on.optimal_tf))
        e_off = float(se3.error_log_norm(gt, r_off.optimal_tf))
        assert e_on < 0.08 and e_off < 0.08, (e_on, e_off)
        np.testing.assert_allclose(
            np.array(r_on.optimal_tf.t), np.array(r_off.optimal_tf.t),
            atol=5e-3,
        )


class TestCropIndexRemap:
    def test_recorded_global_idx_are_original_map_indices(self):
        """When _crop_globals compacts the global layer, recorded
        final_pairings.global_idx must reference the USER's map rows, not
        the hidden cropped/stride-decimated temporary (VERDICT-class
        observability bug: a viewer mapping pairs back to the map would
        draw lines to the wrong points)."""
        rng = np.random.RandomState(7)
        scene = _corridor_scene(rng, 1 << 15)
        local_xyz = _local_view(scene, 200.0, rng, n=1024, radius=30.0)
        gmap = PointCloud.from_numpy(scene, capacity=1 << 15)
        local = {"raw": PointCloud.from_numpy(local_xyz, capacity=1024)}

        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=2.0)],
            solvers=[SolverHorn()],
        )
        params = ICPParameters(
            max_iterations=25, crop_capacity=1 << 12, crop_extra_margin=4.0
        )
        res = icp.align(local, {"raw": gmap}, se3.identity(), params)

        gi = np.asarray(res.final_pairings.pt2pt.global_idx)
        w = np.asarray(res.final_pairings.pt2pt.weight)
        gxyz = np.asarray(res.final_pairings.pt2pt.globl)
        sel = w > 0
        assert sel.sum() > 100
        # every recorded id addresses the ORIGINAL map and the recorded
        # neighbour coordinates are exactly that original row
        assert gi[sel].min() >= 0 and gi[sel].max() < scene.shape[0]
        np.testing.assert_allclose(scene[gi[sel]], gxyz[sel], atol=0)
