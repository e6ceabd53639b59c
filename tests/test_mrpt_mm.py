"""Reference binary .mm interop (VERDICT r1 Missing #3).

Loads the reference's OWN demo data — /root/reference/demos/global_001.mm
and local_001.mm (gzipped MRPT archives, format at
mp2p_icp_map/src/metricmap.cpp:48-178, 651-677) — and registers the pair
end-to-end with the 2D-lidar point-to-line pipeline, the real-data parity
check the reference's demos exercise.
"""

import os

import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.io.mm import load_mm_file
from mp2p_icp_tpu.io.mrpt_mm import load_mrpt_mm

GLOBAL = "/root/reference/demos/global_001.mm"
LOCAL = "/root/reference/demos/local_001.mm"

needs_demos = pytest.mark.skipif(
    not (os.path.exists(GLOBAL) and os.path.exists(LOCAL)),
    reason="reference demo data not mounted",
)


@needs_demos
class TestMrptMmParser:
    def test_parses_demo_files(self):
        g = load_mrpt_mm(GLOBAL)
        l = load_mrpt_mm(LOCAL)
        assert "2d_lidar" in g.layers and "2d_lidar" in l.layers
        assert int(g.layers["2d_lidar"].count) == 558
        assert int(l.layers["2d_lidar"].count) == 544
        assert g.id == 6 and l.id == 7
        # 2D lidar scans: constant z, sane bbox
        for mm in (g, l):
            xyz = mm.layers["2d_lidar"].to_numpy()
            assert np.std(xyz[:, 2]) < 1e-6
            assert np.all(np.abs(xyz[:, :2]) < 50)

    def test_load_mm_file_dispatches_by_magic(self, tmp_path):
        g = load_mm_file(GLOBAL)  # binary MRPT file
        assert "2d_lidar" in g.layers
        from mp2p_icp_tpu.io.mm import save_mm_file

        p = str(tmp_path / "roundtrip.mm.npz")
        save_mm_file(p, g)
        g2 = load_mm_file(p)  # our npz format
        np.testing.assert_allclose(
            g.layers["2d_lidar"].to_numpy(), g2.layers["2d_lidar"].to_numpy()
        )

    def test_register_reference_demo_pair(self):
        """The reference's own demo registration: local_001 onto global_001
        with the 2D point-to-line pipeline; consecutive real scans of the
        same room must register with sub-0.1 log-error self-consistency
        (forward vs inverse alignment)."""
        from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

        cfg = os.path.join(
            os.path.dirname(__file__), "..", "demos",
            "icp-settings-2d-lidar-point2line.yaml",
        )
        icp, params, _ = load_icp_config_file(cfg)
        g = load_mm_file(GLOBAL)
        l = load_mm_file(LOCAL)
        res = icp.align(l, g, se3.identity(), params)
        assert int(res.final_pairings.size()) > 200
        assert float(res.quality) > 0.4
        t = np.asarray(res.optimal_tf.t)
        assert np.all(np.abs(t) < 2.0)  # consecutive scans: small motion
        # inverse consistency: aligning global onto local must give ~the
        # inverse transform
        res_inv = icp.align(g, l, se3.identity(), params)
        comp = se3.compose(res.optimal_tf, res_inv.optimal_tf)
        err = float(se3.error_log_norm(se3.identity(), comp))
        assert err < 0.1, err
