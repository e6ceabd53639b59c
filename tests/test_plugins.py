"""Plugin loading: user modules extending the YAML class registries.

Reference parity: mp2p_icp_map/src/load_plugin.cpp (dlopen of user RTTI
classes) + the ``plugin:`` YAML key (icp_pipeline_from_yaml.cpp:34-38),
re-imagined as Python module plugins.
"""

import textwrap

import numpy as np
import pytest
import yaml


PLUGIN_SRC = textwrap.dedent(
    """
    import dataclasses

    from mp2p_icp_tpu.filters.base import FilterBase
    from mp2p_icp_tpu.matchers.distance_threshold import (
        MatcherPointsDistanceThreshold,
    )


    @dataclasses.dataclass(frozen=True)
    class FilterNoOp(FilterBase):
        def __call__(self, mm, variables=None):
            return mm


    def mp2p_register(api):
        api.register_filter(
            "FilterNoOp", lambda p, variables=None: FilterNoOp()
        )
        api.register_matcher(
            "Matcher_MyCustom",
            lambda p: MatcherPointsDistanceThreshold(
                threshold=float(p.get("threshold", 2.0))
            ),
        )
    """
)


@pytest.fixture()
def plugin_file(tmp_path):
    p = tmp_path / "my_plugin.py"
    p.write_text(PLUGIN_SRC)
    return str(p)


def test_load_plugin_registers_classes(plugin_file):
    from mp2p_icp_tpu.pipeline import filter_pipeline_from_yaml, load_plugin

    load_plugin(plugin_file)
    filters = filter_pipeline_from_yaml(
        [{"class_name": "FilterNoOp", "params": {}}]
    )
    assert len(filters) == 1


def test_load_plugin_idempotent(plugin_file):
    from mp2p_icp_tpu.pipeline import load_plugin

    m1 = load_plugin(plugin_file)
    m2 = load_plugin(plugin_file)
    assert m1 is m2


def test_plugin_search_path(tmp_path, monkeypatch):
    d = tmp_path / "plugdir"
    d.mkdir()
    (d / "relplug.py").write_text(PLUGIN_SRC)
    monkeypatch.setenv("MP2P_ICP_TPU_PLUGIN_PATH", str(d))
    from mp2p_icp_tpu.pipeline import load_plugin

    load_plugin("relplug.py")


def test_plugin_missing_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("MP2P_ICP_TPU_PLUGIN_PATH", str(tmp_path))
    from mp2p_icp_tpu.pipeline import load_plugin

    with pytest.raises(FileNotFoundError):
        load_plugin("does_not_exist.py")


def test_yaml_plugin_key(plugin_file):
    """The top-level ``plugin:`` key loads the module before resolving
    classes, so YAML can use plugin-provided matcher names."""
    from mp2p_icp_tpu.pipeline import icp_pipeline_from_yaml

    cfg = yaml.safe_load(
        f"""
        class_name: mp2p_icp::ICP
        plugin: "{plugin_file}"
        params:
          maxIterations: 5
        solvers:
          - class: mp2p_icp::Solver_Horn
            params: ~
        matchers:
          - class: mp2p_icp::Matcher_MyCustom
            params:
              threshold: 3.0
        quality:
          - class: mp2p_icp::QualityEvaluator_PairedRatio
            params: ~
        """
    )
    icp, params = icp_pipeline_from_yaml(cfg)
    assert params.max_iterations == 5
    assert float(icp.matchers[0].threshold) == 3.0
