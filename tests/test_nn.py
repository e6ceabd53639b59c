"""Grid-hash NN correctness tests vs brute force (the reference trusts
nanoflann; we must prove the hash-grid dual gives identical answers within
its stated completeness envelope)."""

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.ops.nn import nn_search, resolve_one_to_one
from mp2p_icp_tpu.ops.voxel_hash import build_hash_grid


def brute_force_nn(points, valid, queries, k=1):
    pts = np.where(valid[:, None], points, 1e9)
    d = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


class TestHashGridNN:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.n = 500
        cap = 512
        pts = rng.uniform(-10, 10, (cap, 3)).astype(np.float32)
        pts[self.n :] = 1e8  # padding
        self.points = pts
        self.valid = np.arange(cap) < self.n
        self.queries = rng.uniform(-10, 10, (64, 3)).astype(np.float32)

    def test_1nn_exact_within_radius(self):
        radius = 2.0
        grid = build_hash_grid(
            jnp.asarray(self.points), jnp.asarray(self.valid), cell_size=radius
        )
        res = nn_search(
            grid,
            jnp.asarray(self.queries),
            jnp.ones(64, bool),
            k=1,
            k_per_cell=32,
            max_radius_sq=radius * radius,
        )
        bf_idx, bf_d = brute_force_nn(self.points, self.valid, self.queries)
        for i in range(64):
            if bf_d[i, 0] < radius * radius:
                assert bool(res.valid[i, 0]), f"query {i} missed neighbour"
                assert int(res.idx[i, 0]) == int(bf_idx[i, 0])
                np.testing.assert_allclose(
                    float(res.dist_sq[i, 0]), bf_d[i, 0], rtol=1e-4
                )
            else:
                assert not bool(res.valid[i, 0])

    def test_knn(self):
        radius = 3.0
        grid = build_hash_grid(
            jnp.asarray(self.points), jnp.asarray(self.valid), cell_size=radius
        )
        res = nn_search(
            grid,
            jnp.asarray(self.queries),
            jnp.ones(64, bool),
            k=4,
            k_per_cell=48,
            max_radius_sq=radius * radius,
        )
        bf_idx, bf_d = brute_force_nn(self.points, self.valid, self.queries, k=4)
        for i in range(16):
            for j in range(4):
                if bf_d[i, j] < radius * radius:
                    assert bool(res.valid[i, j])
                    np.testing.assert_allclose(
                        float(res.dist_sq[i, j]), bf_d[i, j], rtol=1e-4
                    )

    def test_invalid_queries_masked(self):
        grid = build_hash_grid(
            jnp.asarray(self.points), jnp.asarray(self.valid), cell_size=1.0
        )
        qvalid = np.zeros(64, bool)
        res = nn_search(grid, jnp.asarray(self.queries), jnp.asarray(qvalid), k=1)
        assert not np.asarray(res.valid).any()

    def test_padding_never_matches(self):
        # query near the padding sentinel must find nothing
        grid = build_hash_grid(
            jnp.asarray(self.points), jnp.asarray(self.valid), cell_size=1.0
        )
        q = jnp.asarray([[1e8, 1e8, 1e8]], jnp.float32)
        res = nn_search(grid, q, jnp.ones(1, bool), k=1, max_radius_sq=16.0)
        assert not bool(res.valid[0, 0])

    def test_jit_and_shapes(self):
        grid = build_hash_grid(
            jnp.asarray(self.points), jnp.asarray(self.valid), cell_size=2.0
        )
        f = jax.jit(
            lambda g, q: nn_search(g, q, jnp.ones(q.shape[0], bool), k=1, max_radius_sq=4.0)
        )
        res = f(grid, jnp.asarray(self.queries))
        assert res.idx.shape == (64, 1)


class TestOneToOne:
    def test_duplicate_claims_resolved(self):
        # three locals claim global 5; closest (idx 1) wins
        idx = jnp.asarray([[5], [5], [5], [2]], jnp.int32)
        d = jnp.asarray([[1.0], [0.1], [2.0], [0.5]], jnp.float32)
        valid = jnp.ones((4, 1), bool)
        keep = resolve_one_to_one(idx, d, valid, n_global_capacity=8)
        np.testing.assert_array_equal(np.asarray(keep), [False, True, False, True])

    def test_tie_break_lowest_local(self):
        idx = jnp.asarray([[3], [3]], jnp.int32)
        d = jnp.asarray([[1.0], [1.0]], jnp.float32)
        valid = jnp.ones((2, 1), bool)
        keep = resolve_one_to_one(idx, d, valid, n_global_capacity=4)
        np.testing.assert_array_equal(np.asarray(keep), [True, False])

    def test_invalid_stay_invalid(self):
        idx = jnp.asarray([[-1], [2]], jnp.int32)
        d = jnp.asarray([[1e30], [0.3]], jnp.float32)
        valid = jnp.asarray([[False], [True]])
        keep = resolve_one_to_one(idx, d, valid, n_global_capacity=4)
        np.testing.assert_array_equal(np.asarray(keep), [False, True])


class TestGridVsBruteforceParity:
    """The grid-hash fallback must agree with the production MXU
    brute-force kernel inside its completeness envelope (VERDICT r3
    Next #9: one documented parity test unifies the two NN stacks)."""

    def test_grid_equals_bruteforce_on_decimated_cloud(self):
        from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce

        rng = np.random.RandomState(42)
        cap = 2048
        raw = rng.uniform(-20, 20, (cap, 3)).astype(np.float32)
        # decimate to one point per 1.0 m voxel so bucket occupancy is
        # small and cell_size >= radius holds
        cells = np.floor(raw / 1.0).astype(np.int64)
        _, first = np.unique(
            cells[:, 0] * 10_000_000 + cells[:, 1] * 1000 + cells[:, 2],
            return_index=True,
        )
        pvalid = np.zeros(cap, bool)
        pvalid[first[:1800]] = True
        pts = np.where(pvalid[:, None], raw, 1e8).astype(np.float32)

        queries = rng.uniform(-20, 20, (256, 3)).astype(np.float32)
        qvalid = np.ones(256, bool)
        radius = 1.0

        grid = build_hash_grid(jnp.asarray(pts), jnp.asarray(pvalid), 1.0)
        rg = nn_search(
            grid, jnp.asarray(queries), jnp.asarray(qvalid),
            k=1, k_per_cell=16, max_radius_sq=radius * radius,
        )
        rb = knn_bruteforce(
            jnp.asarray(queries), jnp.asarray(qvalid),
            jnp.asarray(pts), jnp.asarray(pvalid),
            k=1, max_radius_sq=jnp.float32(radius * radius),
        )
        np.testing.assert_array_equal(
            np.asarray(rg.valid[:, 0]), np.asarray(rb.valid[:, 0])
        )
        m = np.asarray(rb.valid[:, 0])
        assert m.sum() > 20  # the envelope is actually exercised
        np.testing.assert_array_equal(
            np.asarray(rg.idx[:, 0])[m], np.asarray(rb.idx[:, 0])[m]
        )
        # the MXU kernel computes distances via the bf16 hi/mid/lo
        # split (~1e-3 relative); indices are exact, distances approximate
        np.testing.assert_allclose(
            np.asarray(rg.dist_sq[:, 0])[m],
            np.asarray(rb.dist_sq[:, 0])[m],
            rtol=2e-3, atol=1e-4,
        )
