"""User plugins: extend the YAML class registries with custom modules.

Reference parity: mp2p_icp_map/src/load_plugin.cpp:21-110 dlopens a user
``.so`` whose static initializers register extra RTTI classes, searching
relative names under ``LD_LIBRARY_PATH``; ``icp_pipeline_from_yaml`` honours
an optional top-level ``plugin:`` key (icp_pipeline_from_yaml.cpp:34-38).

The TPU-native equivalent loads a *Python module* (dotted name or ``.py``
file path; relative paths are searched under the colon-separated
``MP2P_ICP_TPU_PLUGIN_PATH`` env var). On import the plugin registers its
classes via :func:`register_matcher` / :func:`register_solver` /
:func:`register_quality` / :func:`register_filter`, after which they are
instantiable from YAML by name exactly like built-ins.

A plugin module may also define a ``mp2p_register(api)`` entry point which
receives this module (useful to avoid importing mp2p_icp_tpu at module
scope in the plugin).
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
from typing import Callable

_LOADED: dict[str, object] = {}


def _registries():
    from mp2p_icp_tpu.pipeline import yaml_loader as yl

    return yl


def register_matcher(name: str, builder: Callable) -> None:
    """Register a matcher builder ``params_dict -> Matcher`` under a YAML
    class name (with or without a ``namespace::`` prefix)."""
    _registries()._MATCHERS[name.split("::")[-1]] = builder


def register_solver(name: str, builder: Callable) -> None:
    _registries()._SOLVERS[name.split("::")[-1]] = builder


def register_quality(name: str, builder: Callable) -> None:
    _registries()._QUALITY[name.split("::")[-1]] = builder


def register_filter(name: str, builder: Callable) -> None:
    """Register a filter builder ``(params_dict, variables=None) -> Filter``."""
    _registries()._FILTERS[name.split("::")[-1]] = builder


def _search_paths():
    env = os.environ.get("MP2P_ICP_TPU_PLUGIN_PATH", "")
    return [p for p in env.split(":") if p]


def load_plugin(module: str) -> object:
    """Load a plugin by dotted module name or ``.py`` path (reference:
    load_plugin.cpp:70-110). Idempotent per resolved target."""
    if module in _LOADED:
        return _LOADED[module]

    if module.endswith(".py"):
        path = module
        if not os.path.isabs(path) and not os.path.exists(path):
            for d in _search_paths():
                cand = os.path.join(d, path)
                if os.path.exists(cand):
                    path = cand
                    break
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Plugin '{module}' not found (searched "
                f"MP2P_ICP_TPU_PLUGIN_PATH={_search_paths()})"
            )
        name = "mp2p_icp_tpu_plugin_" + os.path.splitext(os.path.basename(path))[0]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    else:
        mod = importlib.import_module(module)

    hook = getattr(mod, "mp2p_register", None)
    if callable(hook):
        hook(sys.modules[__name__])
    _LOADED[module] = mod
    return mod
