"""Spatially-sharded matching (VERDICT r1 Missing #5): global map
partitioned over the 'space' mesh axis, NN merged with all_gather;
sharded result must equal the single-device result."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce
from mp2p_icp_tpu.parallel.spatial import (
    make_spatial_align,
    shard_global_layers,
)
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

needs8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


@needs8
class TestShardedKnn:
    def test_sharded_knn_matches_single_device(self):
        rng = np.random.RandomState(2)
        Q, C, n = 256, 4096, 8
        q = rng.uniform(-20, 20, (Q, 3)).astype(np.float32)
        p = rng.uniform(-20, 20, (C, 3)).astype(np.float32)
        qv = jnp.ones((Q,), bool)
        ref = knn_bruteforce(q, qv, p, jnp.ones((C,), bool), k=2)

        mesh = Mesh(np.array(jax.devices()[:n]), ("space",))
        Cs = C // n
        p_sh = p.reshape(n, Cs, 3)
        pv_sh = np.ones((n, Cs), bool)

        from jax.sharding import PartitionSpec as P

        def body(q, p1, pv1):
            return knn_bruteforce(
                q, qv, p1[0], pv1[0], k=2, spatial_axis="space"
            )

        f = jax.jit(
            jax.shard_map(
                body, mesh=mesh, in_specs=(P(), P("space"), P("space")),
                out_specs=P(), check_vma=False,
            )
        )
        got = f(q, p_sh, pv_sh)
        np.testing.assert_array_equal(np.array(ref.valid), np.array(got.valid))
        np.testing.assert_allclose(
            np.sort(np.array(ref.dist_sq), axis=1),
            np.sort(np.array(got.dist_sq), axis=1),
            atol=5e-3,
        )
        # global indices must address the ORIGINAL cloud: distances
        # recomputed from idx must match
        gi = np.array(got.idx)
        ok = np.array(got.valid)
        d_re = np.sum((q[:, None, :] - p[np.clip(gi, 0, C - 1)]) ** 2, -1)
        np.testing.assert_allclose(
            d_re[ok], np.array(got.dist_sq)[ok], atol=5e-3
        )
        # returned xyz must be the actual neighbour coordinates
        np.testing.assert_allclose(
            np.array(got.xyz)[ok], p[gi[ok]], atol=1e-6
        )


@needs8
class TestSpatialAlign:
    def test_sharded_align_matches_unsharded(self):
        rng = np.random.RandomState(4)
        # structured scene so the pose is well-constrained
        ground = np.stack(
            [rng.uniform(-15, 15, 2000), rng.uniform(-15, 15, 2000),
             np.zeros(2000)], 1)
        wall_y = np.stack(
            [rng.uniform(-15, 15, 1000),
             rng.choice([-5.0, 5.0], 1000), rng.uniform(0, 3, 1000)], 1)
        wall_x = np.stack(
            [rng.choice([-7.0, 7.0], 1000),
             rng.uniform(-15, 15, 1000), rng.uniform(0, 3, 1000)], 1)
        scene = np.concatenate([ground, wall_y, wall_x]).astype(np.float32)
        gt = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.04, -0.01, 0.02)
        scan = scene[rng.choice(4000, 1024, replace=False)]
        local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(scan)))

        g_layers = {"raw": PointCloud.from_numpy(scene, capacity=4096)}
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=1024)}
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
            solvers=[
                SolverHorn(run_up_to_iteration=5),
                SolverGaussNewton(run_from_iteration=6,
                                  gn_params=GNParams(max_iterations=3)),
            ],
        )
        params = ICPParameters(max_iterations=25)
        ref = icp.align(l_layers, g_layers, se3.identity(), params)

        mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
        g_sh = shard_global_layers(g_layers, 8)
        fn = make_spatial_align(icp, params, mesh)
        got = fn(l_layers, g_sh, se3.identity())

        e_ref = float(se3.error_log_norm(gt, ref.optimal_tf))
        e_got = float(se3.error_log_norm(gt, got.optimal_tf))
        assert e_ref < 0.05 and e_got < 0.05, (e_ref, e_got)
        np.testing.assert_allclose(
            np.array(ref.optimal_tf.t), np.array(got.optimal_tf.t), atol=1e-3
        )
        np.testing.assert_allclose(
            np.array(ref.optimal_tf.R), np.array(got.optimal_tf.R), atol=1e-4
        )
        assert int(got.n_iterations) == int(ref.n_iterations)

    def _scene_pair(self, n_scene=4000, n_scan=1024, seed=4):
        rng = np.random.RandomState(seed)
        ground = np.stack(
            [rng.uniform(-15, 15, n_scene // 2),
             rng.uniform(-15, 15, n_scene // 2),
             np.zeros(n_scene // 2)], 1)
        wall_y = np.stack(
            [rng.uniform(-15, 15, n_scene // 4),
             rng.choice([-5.0, 5.0], n_scene // 4),
             rng.uniform(0, 3, n_scene // 4)], 1)
        wall_x = np.stack(
            [rng.choice([-7.0, 7.0], n_scene // 4),
             rng.uniform(-15, 15, n_scene // 4),
             rng.uniform(0, 3, n_scene // 4)], 1)
        scene = np.concatenate([ground, wall_y, wall_x]).astype(np.float32)
        gt = se3.from_xyz_ypr(0.4, -0.2, 0.05, 0.04, -0.01, 0.02)
        scan = scene[rng.choice(scene.shape[0], n_scan, replace=False)]
        local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(scan)))
        return scene, local, gt

    def _assert_sharded_equals(self, icp, params, g_layers, l_layers, gt,
                               n_shards=8, crop=False):
        ref = icp.align(l_layers, g_layers, se3.identity(), params)
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
        g_sh = shard_global_layers(g_layers, n_shards)
        fn = make_spatial_align(icp, params, mesh)
        got = fn(l_layers, g_sh, se3.identity())
        e_ref = float(se3.error_log_norm(gt, ref.optimal_tf))
        e_got = float(se3.error_log_norm(gt, got.optimal_tf))
        assert e_ref < 0.05 and e_got < 0.05, (e_ref, e_got)
        np.testing.assert_allclose(
            np.array(ref.optimal_tf.t), np.array(got.optimal_tf.t),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.array(ref.optimal_tf.R), np.array(got.optimal_tf.R),
            atol=2e-4,
        )
        return ref, got

    def test_sharded_adaptive_schedule(self):
        """The KITTI-style DT->Adaptive+GN schedule runs spatially sharded
        (VERDICT r2 Missing #4: MatcherAdaptive spatial_axis support)."""
        from mp2p_icp_tpu.matchers import MatcherAdaptive

        scene, local, gt = self._scene_pair()
        g_layers = {"raw": PointCloud.from_numpy(scene, capacity=4096)}
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=1024)}
        icp = ICP(
            matchers=[
                MatcherPointsDistanceThreshold(
                    threshold=1.0, run_up_to_iteration=5
                ),
                MatcherAdaptive(
                    confidence_interval=0.75,
                    first_to_second_distance_max=1.2,
                    absolute_max_search_distance=2.0,
                    run_from_iteration=6,
                ),
            ],
            solvers=[
                SolverHorn(run_up_to_iteration=5),
                SolverGaussNewton(run_from_iteration=6,
                                  gn_params=GNParams(max_iterations=3)),
            ],
        )
        self._assert_sharded_equals(
            icp, ICPParameters(max_iterations=20), g_layers, l_layers, gt
        )

    def test_sharded_inlier_ratio(self):
        from mp2p_icp_tpu.matchers import MatcherPointsInlierRatio

        scene, local, gt = self._scene_pair(seed=7)
        g_layers = {"raw": PointCloud.from_numpy(scene, capacity=4096)}
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=1024)}
        icp = ICP(
            matchers=[MatcherPointsInlierRatio(inliers_ratio=0.7)],
            solvers=[SolverHorn()],
        )
        self._assert_sharded_equals(
            icp, ICPParameters(max_iterations=20), g_layers, l_layers, gt
        )

    def test_sharded_multi_matcher_segment(self):
        """Two matchers active in the SAME segment under sharding: the
        cross-matcher paired bitfields span global (cross-shard) ids
        (VERDICT r2 Missing #4: multi-matcher segments used to raise)."""
        from mp2p_icp_tpu.matchers import MatcherAdaptive

        scene, local, gt = self._scene_pair(seed=9)
        g_layers = {"raw": PointCloud.from_numpy(scene, capacity=4096)}
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=1024)}
        icp = ICP(
            matchers=[
                # both run every iteration -> one segment, 2 active
                MatcherPointsDistanceThreshold(threshold=0.8),
                MatcherAdaptive(
                    confidence_interval=0.75,
                    first_to_second_distance_max=1.2,
                    absolute_max_search_distance=2.0,
                ),
            ],
            solvers=[SolverHorn()],
        )
        ref, got = self._assert_sharded_equals(
            icp, ICPParameters(max_iterations=15), g_layers, l_layers, gt
        )
        # the dedup masks must actually bite: pairings counts agree
        assert int(ref.final_pairings.size()) == int(
            got.final_pairings.size()
        )

    def test_sharded_crop_big_map(self):
        """A map bigger than one device's crop budget: per-shard bbox crop
        + sharded sweep == unsharded answer (crop sized to avoid overflow
        decimation, see make_spatial_align note)."""
        rng = np.random.RandomState(11)
        n = 1 << 15  # 32k points across a long corridor
        t = rng.uniform(0, 200, n)
        kind = rng.randint(0, 4, n)
        y = np.where(kind == 0, -5.0, np.where(kind == 1, 5.0,
                                               rng.uniform(-5, 5, n)))
        z = np.where(kind < 2, rng.uniform(0, 3, n),
                     np.where(kind == 2, 0.0, rng.uniform(0, 2.5, n)))
        # cross-walls every 5 m so x is geometrically constrained even in
        # a narrow scan window
        x = np.where(kind == 3, np.round(t / 5.0) * 5.0, t)
        scene = np.stack([x, y, z], 1).astype(np.float32)
        gt = se3.from_xyz_ypr(100.4, -0.2, 0.05, 0.03, -0.01, 0.02)
        near = scene[np.abs(scene[:, 0] - 100.0) < 3.0]
        scan = near[rng.choice(near.shape[0], 512, replace=False)]
        local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(scan)))

        g_layers = {"raw": PointCloud.from_numpy(scene, capacity=n)}
        l_layers = {"raw": PointCloud.from_numpy(local, capacity=512)}
        icp = ICP(
            matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
            solvers=[
                SolverHorn(run_up_to_iteration=5),
                SolverGaussNewton(run_from_iteration=6,
                                  gn_params=GNParams(max_iterations=3)),
            ],
        )
        # per-shard capacity 4096 > crop_capacity 2048 -> crop runs on
        # every shard inside the sharded align; the in-box point count
        # (~1.6k) fits 2048, so neither side decimates and the sharded
        # answer can match the unsharded one exactly
        params = ICPParameters(
            max_iterations=20, crop_capacity=2048, crop_extra_margin=1.0
        )
        guess = se3.from_xyz_ypr(100.0, 0.0, 0.0, 0.0, 0.0, 0.0)

        ref = icp.align(l_layers, g_layers, guess, params)
        mesh = Mesh(np.array(jax.devices()[:8]), ("space",))
        g_sh = shard_global_layers(g_layers, 8)
        fn = make_spatial_align(icp, params, mesh)
        got = fn(l_layers, g_sh, guess)

        e_ref = float(se3.error_log_norm(gt, ref.optimal_tf))
        e_got = float(se3.error_log_norm(gt, got.optimal_tf))
        assert e_ref < 0.05, e_ref
        assert e_got < 0.05, e_got
        # both crops keep every in-box point here, so results agree tightly
        np.testing.assert_allclose(
            np.array(ref.optimal_tf.t), np.array(got.optimal_tf.t),
            atol=2e-3,
        )

    def test_shard_counts_cover_exactly(self):
        pc = PointCloud.from_numpy(
            np.random.RandomState(0).rand(1000, 3).astype(np.float32),
            capacity=2048,
        )
        sh = shard_global_layers({"raw": pc}, 8)["raw"]
        assert sh.xyz.shape == (8, 256, 3)
        assert int(jnp.sum(sh.count)) == 1000
