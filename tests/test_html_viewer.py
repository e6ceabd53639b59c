"""Interactive HTML viewer exports (VERDICT r3 Missing #6).

The standalone .html must embed every layer's decodable point buffer, the
voxel occupancy scalars, the trajectory polyline, and (icplog mode) the
per-iteration poses + pairing endpoints the slider consumes.
"""

import base64
import json
import re

import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap, VoxelGridLayer
from mp2p_icp_tpu.core.pointcloud import PointCloud


def _extract_data(path):
    src = open(path).read()
    m = re.search(r"const DATA=(\{.*?\});\n", src, re.S)
    assert m, "DATA blob missing"
    return json.loads(m.group(1)), src


def _decode(b64):
    return np.frombuffer(base64.b64decode(b64), np.float32)


def test_export_map_html(tmp_path):
    from mp2p_icp_tpu.apps.html_viewer import export_map_html

    rng = np.random.RandomState(0)
    xyz = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    vg = VoxelGridLayer(
        keys=jnp.asarray(rng.randint(-50, 50, (64, 3)).astype(np.int32)),
        occupancy=jnp.asarray(rng.rand(64).astype(np.float32)),
        valid=jnp.asarray(np.arange(64) < 40),
        resolution=0.5,
    )
    mm = MetricMap(layers={
        "raw": PointCloud.from_numpy(
            xyz, intensity=rng.rand(500).astype(np.float32)
        ),
        "vox": vg,
    })
    traj = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
    out = tmp_path / "map.html"
    export_map_html(mm, str(out), trajectory=traj)
    data, src = _extract_data(out)
    assert "webgl" in src
    names = {L["name"]: L for L in data["layers"]}
    assert set(names) == {"raw", "vox"}
    assert _decode(names["raw"]["xyz"]).size == 500 * 3
    assert _decode(names["raw"]["scalar"]).size == 500
    assert names["vox"]["kind"] == "voxels"
    assert _decode(names["vox"]["xyz"]).size == 40 * 3
    assert _decode(data["traj"]).size == 60


def test_export_icplog_html(tmp_path):
    from mp2p_icp_tpu.apps.html_viewer import export_icplog_html
    from mp2p_icp_tpu.icp import ICP, ICPParameters
    from mp2p_icp_tpu.io.icplog import load_log, save_log
    from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
    from mp2p_icp_tpu.solvers.solver import SolverHorn

    rng = np.random.RandomState(1)
    xyz = rng.uniform(-8, 8, (400, 3)).astype(np.float32)
    gt = se3.from_xyz_ypr(0.3, -0.2, 0.1, 0.04, -0.02, 0.01)
    local = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
    g = {"raw": PointCloud.from_numpy(xyz)}
    l = {"raw": PointCloud.from_numpy(local)}
    icp = ICP(
        matchers=[MatcherPointsDistanceThreshold(threshold=1.2)],
        solvers=[SolverHorn()],
    )
    params = ICPParameters(
        max_iterations=10, record_iterations=True, record_pairings=True
    )
    res = icp.align(l, g, se3.identity(), params)
    p = tmp_path / "run.icplog.npz"
    save_log(str(p), l, g, se3.identity(), res)
    log = load_log(str(p))
    out = tmp_path / "run.html"
    export_icplog_html(log, str(out))
    data, _ = _extract_data(out)
    kinds = {L["name"] for L in data["layers"]}
    assert kinds == {"global/raw", "local/raw"}
    local_flags = {L["name"]: L.get("local", False) for L in data["layers"]}
    assert local_flags["local/raw"] and not local_flags["global/raw"]
    assert len(data["iters"]) == 10
    assert all(len(P) == 12 for P in data["iters"])
    assert len(data["pairs"]) == 10
    li = _decode(data["pairs"][5]["l"])
    gi = _decode(data["pairs"][5]["g"])
    assert li.size == gi.size and li.size > 0


def test_mm_viewer_cli_html(tmp_path):
    from mp2p_icp_tpu.apps.mm_viewer import main as mm_viewer_main
    from mp2p_icp_tpu.io.mm import save_mm_file

    rng = np.random.RandomState(2)
    mm = MetricMap(layers={
        "pts": PointCloud.from_numpy(
            rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        )
    })
    mmp = tmp_path / "m.mm.npz"
    save_mm_file(str(mmp), mm)
    traj = tmp_path / "traj.txt"
    mats = np.tile(np.eye(4)[:3].reshape(-1), (5, 1))
    np.savetxt(str(traj), mats)
    out = tmp_path / "m.html"
    rc = mm_viewer_main([
        str(mmp), "--html", str(out), "--trajectory", str(traj),
    ])
    assert rc == 0 and out.exists()
    data, _ = _extract_data(out)
    assert data["layers"][0]["n"] == 200
    assert _decode(data["traj"]).size == 15
