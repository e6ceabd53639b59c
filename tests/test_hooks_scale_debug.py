"""Tests for the round-4 ICP-engine parity additions:

- iteration_hook with stop request -> IterTermReason.HOOK_REQUEST
  (reference: mp2p_icp/src/ICP.cpp:286-303)
- SolverHorn(estimate_scale=True) -> ICPResults.optimal_scale
  (reference: Results.h:35-36, optimal_tf_horn.cpp:177-195)
- generateDebugFiles subsystem: $-template filenames, global counter,
  file + iteration decimation, pre-log functors
  (reference: Parameters.h:66-96, ICP.cpp:384-467)
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pairings import Pairings, PairsPt2Pt
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters, IterTermReason
from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
from mp2p_icp_tpu.solvers.horn import horn_scale
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn


def _problem(n=512, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    gt = se3.from_xyz_ypr(0.4, -0.25, 0.15, 0.06, -0.04, 0.03)
    local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz))) / scale
    return (
        {"raw": PointCloud.from_numpy(xyz)},
        {"raw": PointCloud.from_numpy(local.astype(np.float32))},
        gt,
    )


def _icp():
    return ICP(
        matchers=[MatcherPointsDistanceThreshold(threshold=1.5)],
        solvers=[SolverHorn()],
    )


# ------------------------------------------------------------ iteration hook
def test_iteration_hook_stop_request():
    g, l, _ = _problem()
    traced_shapes = []

    def hook(iteration, R, t, n_pairs):
        # traced predicate: called once at compile time on tracers
        traced_shapes.append((R.shape, t.shape))
        # stop at iteration 1, well before convergence (~4 iters) — like
        # the reference, a stall detected in the SAME iteration would win
        return (iteration >= 1) & (n_pairs > 0)

    params = ICPParameters(max_iterations=25, iteration_hook=hook)
    res = _icp().align(l, g, se3.identity(), params)
    assert int(res.termination_reason) == int(IterTermReason.HOOK_REQUEST)
    # loop ran exactly iterations 0..1 then aborted
    assert int(res.n_iterations) == 2
    assert all(s == ((3, 3), (3,)) for s in traced_shapes)


def test_iteration_hook_passive_matches_no_hook():
    g, l, gt = _problem(seed=3)
    params0 = ICPParameters(max_iterations=25)
    res0 = _icp().align(l, g, se3.identity(), params0)

    params1 = ICPParameters(
        max_iterations=25,
        iteration_hook=lambda it, R, t, n: jnp.asarray(False),
    )
    res1 = _icp().align(l, g, se3.identity(), params1)
    # a passive hook changes nothing
    assert int(res1.n_iterations) == int(res0.n_iterations)
    assert int(res1.termination_reason) == int(res0.termination_reason)
    np.testing.assert_allclose(
        np.asarray(res1.optimal_tf.t), np.asarray(res0.optimal_tf.t),
        atol=1e-6,
    )
    assert float(se3.error_log_norm(gt, res1.optimal_tf)) < 0.05


# ------------------------------------------------------------- horn scale
def test_horn_scale_unit_recovers_known_scale():
    rng = np.random.RandomState(7)
    n, cap = 200, 256
    local = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    s_true = 1.37
    R = np.asarray(se3.from_xyz_ypr(0, 0, 0, 0.3, -0.2, 0.1).R)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    globl = (s_true * local @ R.T + t).astype(np.float32)

    pad = np.zeros((cap - n, 3), np.float32)
    w = np.concatenate([np.ones(n), np.zeros(cap - n)]).astype(np.float32)
    p = Pairings.empty(pt2pt_cap=cap)
    p = dataclasses.replace(
        p,
        pt2pt=PairsPt2Pt(
            local=jnp.asarray(np.concatenate([local, pad])),
            globl=jnp.asarray(np.concatenate([globl, pad])),
            local_idx=jnp.arange(cap, dtype=jnp.int32),
            global_idx=jnp.arange(cap, dtype=jnp.int32),
            weight=jnp.asarray(w),
        ),
    )
    s = float(horn_scale(p))
    assert abs(s - s_true) < 1e-3


def test_icp_fills_optimal_scale():
    # local cloud shrunk by 1/s vs global: the rigid align still converges
    # on the (small-|t|) pair and optimal_scale reports s
    s_true = 1.05
    g, l, _ = _problem(n=1024, seed=5, scale=s_true)
    icp = ICP(
        matchers=[MatcherPointsDistanceThreshold(threshold=2.5)],
        solvers=[SolverHorn(estimate_scale=True)],
    )
    res = icp.align(l, g, se3.identity(), ICPParameters(max_iterations=30))
    assert abs(float(res.optimal_scale) - s_true) < 0.02
    # default solvers keep the reference's forceScaleToUnity behaviour
    res0 = _icp().align(l, g, se3.identity(), ICPParameters(max_iterations=5))
    assert float(res0.optimal_scale) == 1.0


# ------------------------------------------------------------ debug output
def test_generate_debug_files(tmp_path):
    from mp2p_icp_tpu.io.debug_dump import reset_unique_id_counter
    from mp2p_icp_tpu.io.icplog import load_log

    reset_unique_id_counter()
    g, l, _ = _problem(seed=1)
    fmt = str(
        tmp_path
        / "logs"
        / "icp-run-$UNIQUE_ID-local-$LOCAL_ID$LOCAL_LABEL-"
        "global-$GLOBAL_ID$GLOBAL_LABEL.icplog.npz"
    )
    params = ICPParameters(
        max_iterations=12,
        generate_debug_files=True,
        save_iteration_details=True,
        decimation_iteration_details=3,
        decimation_debug_files=2,
        debug_file_name_format=fmt,
    )
    icp = _icp()
    for _ in range(4):
        res = icp.align(l, g, se3.identity(), params)
    # decimationDebugFiles=2: only UNIQUE_IDs 0 and 2 are kept
    files = sorted(p.name for p in (tmp_path / "logs").iterdir())
    assert files == [
        "icp-run-00000-local-00000-global-00000.icplog.npz",
        "icp-run-00002-local-00000-global-00000.icplog.npz",
    ]
    log = load_log(tmp_path / "logs" / files[0])
    assert log["meta"]["n_iterations"] == int(res.n_iterations)
    # iteration details recorded and decimated by 3: ceil(12/3) rows
    assert log["iterations"]["poses"].t.shape[0] == 4
    assert "pairings" in log["iterations"]
    assert log["local"]["raw"].xyz.shape[0] > 0


def test_debug_functor_and_labels(tmp_path):
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.io.debug_dump import reset_unique_id_counter
    from mp2p_icp_tpu.io.icplog import load_log

    reset_unique_id_counter()
    g, l, _ = _problem(seed=2)
    g_mm = MetricMap(layers=dict(g), id=7, label="gmap")
    l_mm = MetricMap(layers=dict(l), id=3, label="scan")

    def shrink(mm):
        # functor_before_logging: drop everything but 16 points
        out = dict(mm.layers)
        pc = out["raw"]
        out["raw"] = PointCloud.from_numpy(pc.to_numpy()[:16], capacity=16)
        return dataclasses.replace(mm, layers=out)

    params = ICPParameters(
        max_iterations=6,
        generate_debug_files=True,
        debug_file_name_format=str(
            tmp_path / "d-$UNIQUE_ID-$LOCAL_LABEL-$GLOBAL_LABEL.icplog.npz"
        ),
        functor_before_logging_local=shrink,
        functor_before_logging_global=shrink,
    )
    _icp().align(l_mm, g_mm, se3.identity(), params)
    path = tmp_path / "d-00000-scan-gmap.icplog.npz"
    assert path.exists()
    log = load_log(path)
    assert log["local"]["raw"].xyz.shape[0] == 16
    assert log["global"]["raw"].xyz.shape[0] == 16


def test_yaml_debug_keys(tmp_path):
    """The reference's camelCase debug-file YAML keys reach ICPParameters
    (Parameters.h:66-96 serialization names)."""
    from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

    cfg = tmp_path / "icp.yaml"
    cfg.write_text("""\
class_name: mp2p_icp::ICP
params:
  maxIterations: 7
  generateDebugFiles: true
  saveIterationDetails: true
  decimationIterationDetails: 4
  decimationDebugFiles: 3
  debugFileNameFormat: "out/icp-$UNIQUE_ID.icplog.npz"
solvers:
  - class: mp2p_icp::Solver_Horn
    params: ~
matchers:
  - class: mp2p_icp::Matcher_Points_DistanceThreshold
    params: { threshold: 1.0 }
""")
    _icp, params, _sections = load_icp_config_file(str(cfg))
    assert params.generate_debug_files is True
    assert params.save_iteration_details is True
    assert params.decimation_iteration_details == 4
    assert params.decimation_debug_files == 3
    assert params.debug_file_name_format == "out/icp-$UNIQUE_ID.icplog.npz"


def test_icp_run_generate_debug_log_flag(tmp_path, monkeypatch):
    """icp-run -d/--generate-debug-log overrides the YAML (reference
    icp-run/main.cpp argGenerateDebugFiles)."""
    from mp2p_icp_tpu.apps.icp_run import main as icp_run_main
    from mp2p_icp_tpu.io.debug_dump import reset_unique_id_counter
    from mp2p_icp_tpu.io.mm import save_mm_file
    from mp2p_icp_tpu.core.metric_map import MetricMap

    reset_unique_id_counter()
    g, l, _ = _problem(seed=4)
    gp = tmp_path / "g.mm.npz"
    lp = tmp_path / "l.mm.npz"
    save_mm_file(str(gp), MetricMap(layers=dict(g)))
    save_mm_file(str(lp), MetricMap(layers=dict(l)))
    cfg = tmp_path / "icp.yaml"
    cfg.write_text("""\
class_name: mp2p_icp::ICP
params:
  maxIterations: 8
  debugFileNameFormat: "%s/icp-run-$UNIQUE_ID.icplog.npz"
solvers:
  - class: mp2p_icp::Solver_Horn
    params: ~
matchers:
  - class: mp2p_icp::Matcher_Points_DistanceThreshold
    params: { threshold: 1.5 }
""" % tmp_path)
    rc = icp_run_main([
        "--input-local", str(lp), "--input-global", str(gp),
        "-c", str(cfg), "-d",
    ])
    assert rc == 0
    assert (tmp_path / "icp-run-00000.icplog.npz").exists()


def test_icp_run_side_filter_configs(tmp_path):
    """--config-filters-local/-global and --entry-name-filters-* resolve
    per-side pipelines like the reference (icp-run/main.cpp:62-96)."""
    from mp2p_icp_tpu.apps.icp_run import main as icp_run_main
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.io.mm import save_mm_file

    g, l, _ = _problem(seed=6)
    gp, lp = tmp_path / "g.mm.npz", tmp_path / "l.mm.npz"
    save_mm_file(str(gp), MetricMap(layers=dict(g)))
    save_mm_file(str(lp), MetricMap(layers=dict(l)))
    cfg = tmp_path / "icp.yaml"
    cfg.write_text("""\
class_name: mp2p_icp::ICP
params: { maxIterations: 6 }
solvers:
  - class: mp2p_icp::Solver_Horn
    params: ~
matchers:
  - class: mp2p_icp::Matcher_Points_DistanceThreshold
    params:
      threshold: 1.5
      pointLayerMatches:
        - { global: "decimated", local: "decimated", weight: 1.0 }
""")
    fl = tmp_path / "filters.yaml"
    fl.write_text("""\
filters:
  - class_name: mp2p_icp_filters::FilterDecimateVoxels
    params:
      output_pointcloud_layer: "decimated"
      voxel_filter_resolution: 0.6
""")
    rc = icp_run_main([
        "--input-local", str(lp), "--input-global", str(gp),
        "-c", str(cfg),
        "--config-filters-local", str(fl),
        "--config-filters-global", str(fl),
    ])
    assert rc == 0
