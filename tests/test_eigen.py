"""Masked eigen estimation tests (reference: estimate_points_eigen used by
Matcher_Point2Line / Matcher_Adaptive / FilterEdgesPlanes)."""

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.ops.eigen import eigh3x3, estimate_points_eigen, masked_mean_cov


def random_spd(rng, scale=1.0):
    A = rng.randn(3, 3) * scale
    return (A @ A.T).astype(np.float32)


class TestEigh3x3:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        mats = np.stack([random_spd(rng) for _ in range(64)])
        evals, evecs = eigh3x3(jnp.asarray(mats))
        ref_vals = np.linalg.eigvalsh(mats)
        np.testing.assert_allclose(evals, ref_vals, rtol=2e-4, atol=2e-4)
        # eigenvector property: A v = lambda v
        for i in range(64):
            for j in range(3):
                v = np.asarray(evecs[i, :, j])
                resid = mats[i] @ v - float(evals[i, j]) * v
                assert np.linalg.norm(resid) < 5e-3 * max(1.0, ref_vals[i, 2])

    def test_isotropic(self):
        evals, evecs = eigh3x3(jnp.eye(3) * 2.0)
        np.testing.assert_allclose(evals, [2, 2, 2], atol=1e-5)
        # eigenvectors orthonormal even in degenerate case
        VtV = np.asarray(evecs).T @ np.asarray(evecs)
        np.testing.assert_allclose(VtV, np.eye(3), atol=1e-5)

    def test_rank_deficient(self):
        # planar covariance: z variance = 0
        A = jnp.diag(jnp.array([4.0, 1.0, 0.0]))
        evals, evecs = eigh3x3(A)
        np.testing.assert_allclose(evals, [0, 1, 4], atol=1e-5)
        np.testing.assert_allclose(np.abs(evecs[:, 0]), [0, 0, 1], atol=1e-4)


class TestMaskedStats:
    def test_masked_mean_cov(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(16, 3).astype(np.float32)
        mask = np.zeros(16, bool)
        mask[:10] = True
        mean, cov, n = masked_mean_cov(jnp.asarray(pts), jnp.asarray(mask))
        assert float(n) == 10
        np.testing.assert_allclose(mean, pts[:10].mean(0), atol=1e-5)
        centered = pts[:10] - pts[:10].mean(0)
        np.testing.assert_allclose(cov, centered.T @ centered / 10, atol=1e-5)

    def test_plane_fit(self):
        # points on plane z = 2 with noise in x,y only -> normal = smallest evec
        rng = np.random.RandomState(2)
        pts = np.zeros((32, 3), np.float32)
        pts[:, :2] = rng.randn(32, 2)
        pts[:, 2] = 2.0
        pe = estimate_points_eigen(jnp.asarray(pts), jnp.ones(32, bool))
        np.testing.assert_allclose(np.abs(pe.eigenvectors[:, 0]), [0, 0, 1], atol=1e-4)
        np.testing.assert_allclose(pe.mean[2], 2.0, atol=1e-5)
        assert float(pe.eigenvalues[0]) < 1e-6

    def test_line_fit(self):
        # points along direction (1,1,0)/sqrt(2) -> largest evec = direction
        t = np.linspace(-1, 1, 20, dtype=np.float32)
        d = np.array([1, 1, 0], np.float32) / np.sqrt(2)
        pts = t[:, None] * d[None, :]
        pe = estimate_points_eigen(jnp.asarray(pts), jnp.ones(20, bool))
        v = np.asarray(pe.eigenvectors[:, 2])
        assert abs(abs(v @ d) - 1) < 1e-4

    def test_batched(self):
        rng = np.random.RandomState(3)
        pts = rng.randn(8, 12, 3).astype(np.float32)
        mask = rng.rand(8, 12) > 0.3
        pe = estimate_points_eigen(jnp.asarray(pts), jnp.asarray(mask))
        assert pe.mean.shape == (8, 3)
        assert pe.eigenvalues.shape == (8, 3)
        # ascending order
        assert (np.diff(np.asarray(pe.eigenvalues), axis=-1) >= -1e-6).all()
