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


class TestBf16SplitPrecision:
    """The TPU kernel's hi/mid/lo bf16 coordinate split must reproduce f32
    distances to ~1e-3 m^2 at KITTI coordinate scale (+-120 m). The split
    uses integer mantissa masking so XLA's allow_excess_precision cannot
    elide the decomposition (it did, before the masking fix)."""

    def test_split3_reconstructs(self):
        from mp2p_icp_tpu.ops.nn_bruteforce import _split3

        rng = np.random.RandomState(3)
        x = jnp.asarray((rng.rand(4, 257) - 0.5) * 240, jnp.float32)
        hi, mid, lo = jax.jit(_split3)(x)
        recon = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
                 + lo.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(recon - x)))
        assert err < 1e-4  # three truncation tiers ~ 2^-24 relative
        # each part must be exactly bf16-representable
        for part in (hi, mid, lo):
            f = part.astype(jnp.float32)
            assert float(jnp.max(jnp.abs(
                f - f.astype(jnp.bfloat16).astype(jnp.float32)))) == 0.0

    def test_kitti_scale_distances(self):
        rng = np.random.RandomState(4)
        q = ((rng.rand(512, 3) - 0.5) * 240).astype(np.float32)
        p = ((rng.rand(640, 3) - 0.5) * 240).astype(np.float32)
        res = knn_bruteforce(
            jnp.asarray(q), jnp.ones(512, bool),
            jnp.asarray(p), jnp.ones(640, bool),
            k=1, backend="pallas", interpret=True,
        )
        d2_exact = (
            (q[:, None, :].astype(np.float64) - p[None, :, :]) ** 2
        ).sum(-1)
        chosen = d2_exact[np.arange(512), np.asarray(res.idx[:, 0])]
        # chosen neighbour within 1e-2 m^2 of the true nearest (mm-level
        # at metre-scale spacings; tie-level for ICP)
        assert float(np.max(chosen - d2_exact.min(1))) < 1e-2
        # reported d2 close to the exact d2 of the chosen point
        assert float(
            np.max(np.abs(np.asarray(res.dist_sq[:, 0]) - chosen))
        ) < 2e-2


class TestQuerySlabbing:
    def test_large_query_count_matches_xla(self):
        """Q > 8192 query slabbing on the pallas path (VMEM tile bound):
        slabbed pallas (interpret) == single-shot XLA, exactly."""
        rng = np.random.RandomState(5)
        Q, C = 9000, 700  # Qp = 9216 > 8192 -> two slabs (8192 + 1024)
        queries = rng.uniform(-10, 10, (Q, 3)).astype(np.float32)
        points = rng.uniform(-10, 10, (C, 3)).astype(np.float32)
        qv = np.ones(Q, bool)
        qv[8950:] = False  # invalids land in the second slab
        pv = np.ones(C, bool)
        a = knn_bruteforce(
            jnp.asarray(queries), jnp.asarray(qv), jnp.asarray(points),
            jnp.asarray(pv), k=2, backend="pallas", interpret=True,
        )
        b = knn_bruteforce(
            jnp.asarray(queries), jnp.asarray(qv), jnp.asarray(points),
            jnp.asarray(pv), k=2, backend="xla",
        )
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        sel = np.asarray(a.valid)
        np.testing.assert_array_equal(
            np.asarray(a.idx)[sel], np.asarray(b.idx)[sel]
        )
        np.testing.assert_allclose(
            np.asarray(a.dist_sq)[sel], np.asarray(b.dist_sq)[sel],
            rtol=0, atol=5e-3,
        )


class TestBatchSlabbing:
    def test_vmap_batch_slabs_match_unslabbed(self, monkeypatch):
        """VERDICT r3 Next #3: batches whose VMEM residency exceeds the
        proven budget are swept as sequential sub-batches of the same
        gridless kernel — results must equal the per-pair sweeps."""
        import jax

        from mp2p_icp_tpu.ops import nn_bruteforce as nb

        rng = np.random.RandomState(5)
        B, Q, C = 5, 64, 256
        qs = rng.uniform(-10, 10, (B, Q, 3)).astype(np.float32)
        ps = rng.uniform(-10, 10, (B, C, 3)).astype(np.float32)
        qv = np.ones((B, Q), bool)
        pv = np.ones((B, C), bool)

        def one(q, v, p, w):
            return nb.knn_bruteforce(
                q, v, p, w, k=2, backend="pallas", interpret=True
            )

        # force the slab path: budget fits ~2 batch elements
        per_b = 64 * (nb._round_up(Q, 512) + nb._round_up(C, 128))
        monkeypatch.setattr(nb, "BATCH_VMEM_BUDGET", per_b * 2)
        batched = jax.vmap(one)(
            jnp.asarray(qs), jnp.asarray(qv), jnp.asarray(ps), jnp.asarray(pv)
        )
        monkeypatch.setattr(nb, "BATCH_VMEM_BUDGET", 40 << 20)
        nb._make_nnk_pallas.cache_clear()
        ref = jax.vmap(one)(
            jnp.asarray(qs), jnp.asarray(qv), jnp.asarray(ps), jnp.asarray(pv)
        )
        np.testing.assert_array_equal(
            np.asarray(batched.idx), np.asarray(ref.idx)
        )
        np.testing.assert_allclose(
            np.asarray(batched.dist_sq), np.asarray(ref.dist_sq), rtol=1e-5
        )
        nb._make_nnk_pallas.cache_clear()
