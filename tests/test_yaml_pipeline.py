"""YAML pipeline loading tests — the reference's own demo configs must load
and run (reference: demos/icp-settings-example1.yaml, icp-settings-kitti.yaml)."""

import numpy as np
import pytest
import yaml

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters import apply_filter_pipeline
from mp2p_icp_tpu.io.xyz import load_xyz_file
from mp2p_icp_tpu.matchers import (
    MatcherAdaptive,
    MatcherPointsDistanceThreshold,
)
from mp2p_icp_tpu.pipeline.yaml_loader import (
    filter_pipeline_from_yaml,
    icp_pipeline_from_yaml,
    icp_pipeline_from_yaml_file,
    load_icp_config_file,
)
from mp2p_icp_tpu.solvers.robust import RobustKernel
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

EXAMPLE1 = "/root/reference/demos/icp-settings-example1.yaml"
KITTI = "/root/reference/demos/icp-settings-kitti.yaml"
REF_DEMO_DIR = "/root/reference/demos"


class TestAllReferenceDemoYamls:
    """Permanent sweep of EVERY reference demo YAML through the repo's own
    loaders (VERDICT r4 Next #5b) — schema regressions surface here."""

    def test_all_reference_demo_yamls_load(self):
        import glob
        import os

        from mp2p_icp_tpu.filters.generator import generators_from_yaml

        paths = sorted(glob.glob(os.path.join(REF_DEMO_DIR, "*.yaml")))
        assert len(paths) >= 12  # the reference ships 12 demo configs
        for path in paths:
            name = os.path.basename(path)
            with open(path) as f:
                cfg = yaml.safe_load(f)
            if "libpointmatcher" in name:
                continue  # covered by the explicit-raise test below
            if name.startswith("icp-settings"):
                icp, params = icp_pipeline_from_yaml(cfg)
                assert icp.matchers and icp.solvers, name
            else:
                # sm2mm / mm-filter configs: generators + filter sections
                built_any = False
                if "generators" in cfg and cfg["generators"]:
                    gens = generators_from_yaml(cfg["generators"])
                    assert gens, name
                    built_any = True
                for section in ("filters", "final_filters"):
                    if section in cfg and cfg[section]:
                        filters = filter_pipeline_from_yaml(cfg[section])
                        assert filters, f"{name}:{section}"
                        built_any = True
                assert built_any, f"{name}: no recognised section"

    def test_libpointmatcher_config_raises(self):
        """The optional external-engine wrapper must refuse loudly, not
        return an empty ICP (reference: icp_pipeline_from_yaml.cpp:26-77
        instantiates the wrapper; it is n/a here)."""
        path = (
            f"{REF_DEMO_DIR}/icp-settings-example-libpointmatcher.yaml"
        )
        with open(path) as f:
            cfg = yaml.safe_load(f)
        with pytest.raises(ValueError, match="libpointmatcher"):
            icp_pipeline_from_yaml(cfg)


class TestLoadReferenceConfigs:
    def test_example1(self):
        icp, params = icp_pipeline_from_yaml_file(EXAMPLE1)
        assert params.max_iterations == 100
        assert params.min_abs_step_trans == pytest.approx(1e-4)
        assert len(icp.solvers) == 1 and isinstance(icp.solvers[0], SolverHorn)
        assert len(icp.matchers) == 1
        m = icp.matchers[0]
        assert isinstance(m, MatcherPointsDistanceThreshold)
        assert m.threshold == pytest.approx(0.01)
        assert m.layer_matches[0].global_layer == "raw"
        assert m.layer_matches[0].local_layer == "decimated"

    def test_kitti(self):
        icp, params = icp_pipeline_from_yaml_file(KITTI)
        assert params.max_iterations == 200
        assert len(icp.solvers) == 2
        horn, gn = icp.solvers
        assert isinstance(horn, SolverHorn) and horn.run_up_to_iteration == 5
        assert isinstance(gn, SolverGaussNewton)
        assert gn.run_from_iteration == 6
        assert gn.gn_params.kernel == RobustKernel.GEMAN_MCCLURE
        assert gn.gn_params.kernel_param == pytest.approx(0.15)
        assert gn.gn_params.max_iterations == 3
        dist, adap = icp.matchers
        assert isinstance(dist, MatcherPointsDistanceThreshold)
        assert dist.threshold == pytest.approx(2.0)
        assert dist.run_up_to_iteration == 5
        assert isinstance(adap, MatcherAdaptive)
        assert adap.confidence_interval == pytest.approx(0.75)
        assert adap.run_from_iteration == 6

    def test_kitti_filters_section(self):
        icp, params, sections = load_icp_config_file(KITTI)
        assert "filters" in sections
        f = sections["filters"][0]
        assert f.voxel_filter_resolution == pytest.approx(2.0)
        assert f.output_pointcloud_layer == "decimated"


class TestEndToEndFromYaml:
    def test_example1_bunny_registration(self):
        """The reference's first-gate scenario (BASELINE.md): example1 config
        on the bunny pair, ||log err|| < 0.1."""
        icp, params, sections = load_icp_config_file(EXAMPLE1)
        pc = load_xyz_file("/root/reference/demos/bunny_decim.xyz.gz")
        rng = np.random.RandomState(42)
        xyz = pc.to_numpy()
        bbox = xyz.max(0) - xyz.min(0)
        # reference-strength perturbation (test-mp2p_icp_algos.cpp:242-262)
        d = rng.uniform(-0.15 * bbox, 0.15 * bbox)
        ang = np.deg2rad(rng.uniform(-10, 10, 3))
        gt = se3.from_xyz_ypr(d[0], d[1], d[2], ang[0], ang[1], ang[2])
        import jax.numpy as jnp

        local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))

        g_layers = apply_filter_pipeline(
            sections["filters_global_map"], {"raw": pc}
        )
        l_layers = apply_filter_pipeline(
            sections["filters_local_map"],
            {"raw": PointCloud.from_numpy(local_xyz)},
        )
        res = icp.align(l_layers, g_layers, se3.identity(), params)
        err = float(se3.error_log_norm(gt, res.optimal_tf))
        assert err < 0.1, f"err={err}"


class TestExpressions:
    def test_numeric_expressions_fold(self):
        entries = yaml.safe_load(
            """
- class_name: mp2p_icp_filters::FilterDecimateVoxels
  params:
    voxel_filter_resolution: "$f{0.05*MAX_SENSOR_RANGE}"
"""
        )
        filters = filter_pipeline_from_yaml(
            entries, variables={"MAX_SENSOR_RANGE": 80.0}
        )
        assert filters[0].voxel_filter_resolution == pytest.approx(4.0)

    def test_unknown_class_raises(self):
        with pytest.raises(ValueError):
            filter_pipeline_from_yaml(
                [{"class_name": "mp2p_icp_filters::FilterDoesNotExist"}]
            )
