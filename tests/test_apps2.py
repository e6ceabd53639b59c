"""Tests for sm-cli / mm-georef / viewer apps."""

import numpy as np
import yaml

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import Georeferencing, MetricMap
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.generator import Observation
from mp2p_icp_tpu.filters.sm2mm import Keyframe, SimpleMap
from mp2p_icp_tpu.io.mm import load_mm_file, save_mm_file


def make_sm(path, n=4):
    sm = SimpleMap()
    rng = np.random.RandomState(0)
    for i in range(n):
        sm.keyframes.append(
            Keyframe(
                pose=se3.from_xyz_ypr(float(i), 0.1 * i, 0, 0, 0, 0),
                observations=[Observation(xyz=rng.randn(16, 3))],
            )
        )
    sm.save(path)
    return sm


class TestSmCli:
    def test_info(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import sm_cli

        p = str(tmp_path / "a.sm.npz")
        make_sm(p)
        assert sm_cli.main(["info", p]) == 0
        out = capsys.readouterr().out
        assert "keyframes: 4" in out
        assert "trajectory length" in out

    def test_join_cut(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import sm_cli
        from mp2p_icp_tpu.filters.sm2mm import SimpleMap

        a = str(tmp_path / "a.sm.npz")
        b = str(tmp_path / "b.sm.npz")
        make_sm(a)
        make_sm(b, n=2)
        j = str(tmp_path / "j.sm.npz")
        assert sm_cli.main(["join", a, b, "-o", j]) == 0
        assert len(SimpleMap.load(j).keyframes) == 6
        c = str(tmp_path / "c.sm.npz")
        assert sm_cli.main(
            ["cut", j, "--from-index", "1", "--to-index", "4", "-o", c]
        ) == 0
        assert len(SimpleMap.load(c).keyframes) == 3

    def test_tf(self, tmp_path):
        from mp2p_icp_tpu.apps import sm_cli
        from mp2p_icp_tpu.filters.sm2mm import SimpleMap

        a = str(tmp_path / "a.sm.npz")
        make_sm(a)
        o = str(tmp_path / "t.sm.npz")
        assert sm_cli.main(["tf", a, "-t", "10 0 0 0 0 0", "-o", o]) == 0
        sm = SimpleMap.load(o)
        np.testing.assert_allclose(
            np.asarray(sm.keyframes[0].pose.t), [10, 0, 0], atol=1e-5
        )

    def test_trim(self, tmp_path):
        # keyframes at x = 0,1,2,3 — trim keeps those inside the bbox
        # (reference: sm-cli-trim.cpp:37-46)
        from mp2p_icp_tpu.apps import sm_cli
        from mp2p_icp_tpu.filters.sm2mm import SimpleMap

        a = str(tmp_path / "a.sm.npz")
        make_sm(a)
        o = str(tmp_path / "trim.sm.npz")
        assert sm_cli.main([
            "trim", a,
            "--min-corner", "0.5 -10 -10",
            "--max-corner", "2.5 10 10",
            "-o", o,
        ]) == 0
        sm = SimpleMap.load(o)
        assert len(sm.keyframes) == 2
        xs = [float(np.asarray(kf.pose.t)[0]) for kf in sm.keyframes]
        assert xs == [1.0, 2.0]

    def test_export_kfs(self, tmp_path):
        from mp2p_icp_tpu.apps import sm_cli

        a = str(tmp_path / "a.sm.npz")
        make_sm(a)
        o = str(tmp_path / "kfs.txt")
        assert sm_cli.main(["export-kfs", a, "-o", o]) == 0
        data = np.loadtxt(o)
        assert data.shape == (4, 8)

    def test_export_rawlog(self, tmp_path):
        """Each KF -> one sensory frame: obs + 'pose' RobotPose + 'twist'
        comment (reference: apps/sm-cli/sm-cli-export-rawlog.cpp:39-88)."""
        from mp2p_icp_tpu.apps import sm_cli
        from mp2p_icp_tpu.io.rawlog import Rawlog

        a = str(tmp_path / "a.sm.npz")
        sm = make_sm(a)
        sm.keyframes[1].twist = (0.5, 0, 0, 0, 0, 0.1)
        sm.save(a)
        o = str(tmp_path / "out.rawlog.npz")
        assert sm_cli.main(["export-rawlog", a, "-o", o]) == 0
        rl = Rawlog.load(o)
        # 4 KFs x (1 cloud + 1 pose) + 1 twist comment
        assert len(rl) == 9
        assert rl.frames == sorted(rl.frames)  # grouped per KF
        poses = [x for x in rl.observations
                 if x.class_name == "CObservationRobotPose"]
        assert len(poses) == 4
        np.testing.assert_allclose(
            np.asarray(poses[2].sensor_pose.t)[0], 2.0, atol=1e-6
        )
        twists = [x for x in rl.observations if x.sensor_label == "twist"]
        assert len(twists) == 1 and "0.5" in twists[0].text


class TestMmGeoref:
    def test_extract_inject_roundtrip(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import mm_georef

        mm = MetricMap()
        mm.layers["raw"] = PointCloud.from_numpy(np.zeros((3, 3)))
        mm.georeferencing = Georeferencing(latitude=36.7, longitude=-2.1,
                                           height=120.0)
        src = str(tmp_path / "g.mm.npz")
        save_mm_file(src, mm)
        gy = str(tmp_path / "georef.yaml")
        assert mm_georef.main([src, "--extract", gy]) == 0
        d = yaml.safe_load(open(gy))
        assert d["georeferencing"]["latitude"] == 36.7

        # inject into a georef-less map
        mm2 = MetricMap()
        mm2.layers["raw"] = PointCloud.from_numpy(np.zeros((3, 3)))
        src2 = str(tmp_path / "plain.mm.npz")
        save_mm_file(src2, mm2)
        out = str(tmp_path / "geo2.mm.npz")
        assert mm_georef.main([src2, "--inject", gy, "-o", out]) == 0
        assert load_mm_file(out).georeferencing.latitude == 36.7

    def test_print_no_georef(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import mm_georef

        mm = MetricMap()
        mm.layers["raw"] = PointCloud.from_numpy(np.zeros((2, 3)))
        src = str(tmp_path / "p.mm.npz")
        save_mm_file(src, mm)
        assert mm_georef.main([src]) == 0
        assert "no georeferencing" in capsys.readouterr().out


class TestViewers:
    def test_mm_viewer_renders(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import mm_viewer

        mm = MetricMap()
        mm.layers["raw"] = PointCloud.from_numpy(
            np.random.RandomState(0).randn(200, 3).astype(np.float32)
        )
        src = str(tmp_path / "v.mm.npz")
        save_mm_file(src, mm)
        prefix = str(tmp_path / "render")
        assert mm_viewer.main([src, "-o", prefix]) == 0
        import pathlib

        assert pathlib.Path(f"{prefix}_raw.png").exists()

    def test_icp_log_viewer(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import icp_log_viewer, icp_run

        log = str(tmp_path / "run.icplog.npz")
        assert icp_run.main(
            [
                "--input-local", "/root/reference/demos/bunny_decim.xyz.gz",
                "--input-global", "/root/reference/demos/bunny_decim.xyz.gz",
                "-c", "/root/reference/demos/icp-settings-example1.yaml",
                "--out-log", log,
            ]
        ) == 0
        prefix = str(tmp_path / "log")
        assert icp_log_viewer.main([log, "-o", prefix]) == 0
        out = capsys.readouterr().out
        assert "quality" in out
        import pathlib

        assert pathlib.Path(f"{prefix}_overlay.png").exists()


class TestSmFilter:
    def test_filters_observations(self, tmp_path, capsys):
        import yaml as _yaml

        from mp2p_icp_tpu.apps import sm_filter
        from mp2p_icp_tpu.filters.sm2mm import SimpleMap

        src = str(tmp_path / "in.sm.npz")
        make_sm(src)  # 4 kfs x 16 points
        pipe = tmp_path / "p.yaml"
        pipe.write_text(
            _yaml.safe_dump(
                {
                    "filters": [
                        {
                            "class_name": "mp2p_icp_filters::FilterByRange",
                            "params": {
                                "input_pointcloud_layer": "raw",
                                "output_layer_between": "near",
                                "range_min": 0.0,
                                "range_max": 1.0,
                            },
                        }
                    ]
                }
            )
        )
        out = str(tmp_path / "out.sm.npz")
        assert sm_filter.main(
            ["-i", src, "-o", out, "-p", str(pipe), "--output-layer", "near"]
        ) == 0
        sm2 = SimpleMap.load(out)
        # filtered observations only keep range<=1 points
        for kf in sm2.keyframes:
            for o in kf.observations:
                assert (np.linalg.norm(o.xyz, axis=1) <= 1.0 + 1e-6).all()
