"""Native fastload library tests (C++ parser vs numpy ground truth)."""

import gzip
import time

import numpy as np
import pytest

from mp2p_icp_tpu.io.native import available, parse_float_table
from mp2p_icp_tpu.io.xyz import load_xyz_file


class TestParser:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        data = rng.randn(500, 4).astype(np.float32)
        text = "\n".join(
            " ".join(f"{v:.6f}" for v in row) for row in data
        ).encode()
        out = parse_float_table(text)
        # %.6f truncates to 6 decimals — compare at format precision
        np.testing.assert_allclose(out, data, atol=1e-6)

    def test_comments_and_commas(self):
        text = b"# header comment\n1.0, 2.0, 3.0\n# mid comment\n4 5 6\n"
        out = parse_float_table(text)
        np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])

    def test_empty(self):
        assert parse_float_table(b"").shape[0] == 0
        assert parse_float_table(b"# only comments\n").shape[0] == 0

    def test_bunny_matches_reference_loader(self):
        pc = load_xyz_file("/root/reference/demos/bunny_decim.xyz.gz")
        assert int(pc.count) == 10642
        # spot check first row against the known file contents
        np.testing.assert_allclose(
            pc.to_numpy()[0], [0.033406, 0.082227, 0.041330], atol=1e-6
        )

    @pytest.mark.skipif(not available(), reason="native lib not built")
    def test_native_is_faster_than_numpy(self):
        import io

        rng = np.random.RandomState(1)
        data = rng.randn(20000, 3).astype(np.float32)
        text = "\n".join(
            " ".join(f"{v:.6f}" for v in row) for row in data
        ).encode()
        parse_float_table(text)  # warmup (may trigger the one-time build)

        def best_of(fn, n=3):
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_native = best_of(lambda: parse_float_table(text))
        t_numpy = best_of(
            lambda: np.loadtxt(io.BytesIO(text), dtype=np.float32)
        )
        assert t_native < t_numpy  # typically 10-50x faster
