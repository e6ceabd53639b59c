"""Brute-force MXU kNN tests: XLA path and Pallas kernel (interpret mode)
against numpy ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce


def numpy_knn(queries, points, point_valid, k):
    pts = np.where(point_valid[:, None], points, 1e9)
    d = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


@pytest.fixture
def problem():
    rng = np.random.RandomState(0)
    C, Q = 300, 100
    points = rng.uniform(-10, 10, (C, 3)).astype(np.float32)
    queries = rng.uniform(-10, 10, (Q, 3)).astype(np.float32)
    point_valid = np.ones(C, bool)
    point_valid[250:] = False
    query_valid = np.ones(Q, bool)
    return queries, query_valid, points, point_valid


@pytest.mark.parametrize("backend", ["xla", "pallas"])
class TestBruteForce:
    def run(self, backend, *args, **kw):
        kw.setdefault("interpret", backend == "pallas")
        return knn_bruteforce(*args, backend=backend, **kw)

    def test_1nn_exact(self, problem, backend):
        queries, qv, points, pv = problem
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.asarray(pv), k=1,
        )
        gt_idx, gt_d = numpy_knn(queries, points, pv, 1)
        np.testing.assert_array_equal(np.asarray(res.idx[:, 0]), gt_idx[:, 0])
        np.testing.assert_allclose(
            np.asarray(res.dist_sq[:, 0]), gt_d[:, 0], rtol=1e-3, atol=1e-3
        )

    def test_knn4(self, problem, backend):
        queries, qv, points, pv = problem
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.asarray(pv), k=4,
        )
        gt_idx, gt_d = numpy_knn(queries, points, pv, 4)
        # distances must match (indices may permute on ties)
        np.testing.assert_allclose(
            np.asarray(res.dist_sq), gt_d, rtol=1e-3, atol=1e-3
        )
        assert np.asarray(res.valid).all()

    def test_radius_mask(self, problem, backend):
        queries, qv, points, pv = problem
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.asarray(pv), k=1,
            max_radius_sq=jnp.asarray(0.25),
        )
        gt_idx, gt_d = numpy_knn(queries, points, pv, 1)
        v = np.asarray(res.valid[:, 0])
        np.testing.assert_array_equal(v, gt_d[:, 0] < 0.25)
        assert (np.asarray(res.idx[:, 0])[~v] == -1).all()

    def test_per_query_radius(self, problem, backend):
        queries, qv, points, pv = problem
        r = np.full(queries.shape[0], 1e9, np.float32)
        r[:50] = 1e-12  # first 50 queries: impossible radius
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.asarray(pv), k=1,
            max_radius_sq=jnp.asarray(r),
        )
        v = np.asarray(res.valid[:, 0])
        assert not v[:50].any()
        assert v[50:].all()

    def test_invalid_queries(self, problem, backend):
        queries, qv, points, pv = problem
        qv = qv.copy()
        qv[10:20] = False
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.asarray(pv), k=1,
        )
        assert not np.asarray(res.valid[10:20]).any()

    def test_all_points_invalid(self, problem, backend):
        queries, qv, points, pv = problem
        res = self.run(
            backend, jnp.asarray(queries), jnp.asarray(qv),
            jnp.asarray(points), jnp.zeros_like(jnp.asarray(pv)), k=1,
        )
        assert not np.asarray(res.valid).any()
