"""PointCloud / MetricMap container tests (reference test analogue:
serialization + sanity checks, tests/test-mp2p_map_serialization.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pointcloud import PointCloud, round_capacity, sanity_check


class TestPointCloud:
    def test_from_numpy_padding(self):
        xyz = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        pc = PointCloud.from_numpy(xyz)
        assert pc.capacity == 256
        assert int(pc.count) == 100
        np.testing.assert_allclose(pc.to_numpy(), xyz)
        assert float(pc.xyz[100, 0]) == PointCloud.PAD_VALUE

    def test_round_capacity(self):
        assert round_capacity(1) == 256
        assert round_capacity(256) == 256
        assert round_capacity(257) == 512
        assert round_capacity(10642) == 16384

    def test_valid_mask(self):
        pc = PointCloud.from_numpy(np.zeros((10, 3)))
        m = np.asarray(pc.valid_mask())
        assert m[:10].all() and not m[10:].any()

    def test_bounding_box(self):
        xyz = np.array([[0, 0, 0], [1, 2, 3], [-1, 0.5, 2]], np.float32)
        pc = PointCloud.from_numpy(xyz)
        mn, mx = pc.bounding_box()
        np.testing.assert_allclose(mn, [-1, 0, 0])
        np.testing.assert_allclose(mx, [1, 2, 3])

    def test_transform_keeps_padding(self):
        pc = PointCloud.from_numpy(np.ones((5, 3), np.float32))
        pose = se3.Pose(jnp.eye(3), jnp.array([1.0, 0, 0]))
        out = pc.transformed(pose)
        np.testing.assert_allclose(out.to_numpy(), [[2, 1, 1]] * 5)
        assert float(out.xyz[5, 0]) == PointCloud.PAD_VALUE

    def test_channels(self):
        xyz = np.zeros((4, 3))
        pc = PointCloud.from_numpy(
            xyz, intensity=[1, 2, 3, 4], ring=[0, 1, 0, 1], time=[0.1] * 4
        )
        assert sanity_check(pc)
        np.testing.assert_allclose(pc.intensity[:4], [1, 2, 3, 4])

    def test_jit_compatible(self):
        pc = PointCloud.from_numpy(np.random.randn(50, 3).astype(np.float32))

        @jax.jit
        def centroid(p: PointCloud):
            m = p.valid_mask().astype(jnp.float32)
            return jnp.sum(p.xyz * m[:, None], 0) / jnp.sum(m)

        c = centroid(pc)
        np.testing.assert_allclose(c, pc.to_numpy().mean(0), atol=1e-5)


class TestMetricMap:
    def test_layers_and_summary(self):
        mm = MetricMap()
        assert mm.empty()
        mm.layers["raw"] = PointCloud.from_numpy(np.zeros((7, 3)))
        assert not mm.empty()
        assert mm.size() == 7
        assert "raw" in mm.contents_summary()

    def test_merge_with(self):
        a = MetricMap()
        a.layers["raw"] = PointCloud.from_numpy(np.zeros((5, 3), np.float32))
        b = MetricMap()
        b.layers["raw"] = PointCloud.from_numpy(np.ones((3, 3), np.float32))
        pose = se3.Pose(jnp.eye(3), jnp.array([1.0, 0, 0]))
        a.merge_with(b, pose)
        pts = a.point_layer("raw").to_numpy()
        assert pts.shape == (8, 3)
        np.testing.assert_allclose(pts[5:], [[2, 1, 1]] * 3)
