"""IO formats + CLI apps tests (reference categories: serialization
round-trips, app-level converters)."""

import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import Georeferencing, MetricMap, VoxelGridLayer
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.io.kitti import load_kitti_bin, save_kitti_bin
from mp2p_icp_tpu.io.mm import load_mm_file, save_mm_file
from mp2p_icp_tpu.io.xyz import load_xyz_file, save_xyz_file


class TestMmRoundtrip:
    def test_point_layers_and_channels(self, tmp_path):
        mm = MetricMap(id=7, label="test")
        mm.layers["raw"] = PointCloud.from_numpy(
            np.random.RandomState(0).randn(100, 3).astype(np.float32),
            intensity=np.arange(100, dtype=np.float32),
        )
        mm.georeferencing = Georeferencing(latitude=36.7, longitude=-2.3)
        p = str(tmp_path / "map.mm.npz")
        save_mm_file(p, mm)
        mm2 = load_mm_file(p)
        assert mm2.id == 7 and mm2.label == "test"
        np.testing.assert_allclose(
            mm2.point_layer("raw").to_numpy(), mm.point_layer("raw").to_numpy()
        )
        np.testing.assert_allclose(
            mm2.point_layer("raw").intensity, mm.point_layer("raw").intensity
        )
        assert mm2.georeferencing.latitude == pytest.approx(36.7)

    def test_voxel_layer(self, tmp_path):
        import jax.numpy as jnp

        mm = MetricMap()
        vg = VoxelGridLayer.empty(64, resolution=0.25)
        import dataclasses

        vg = dataclasses.replace(
            vg,
            keys=vg.keys.at[0].set(jnp.asarray([1, 2, 3])),
            occupancy=vg.occupancy.at[0].set(0.9),
            valid=vg.valid.at[0].set(True),
        )
        mm.layers["voxels"] = vg
        p = str(tmp_path / "vox.mm.npz")
        save_mm_file(p, mm)
        mm2 = load_mm_file(p)
        v2 = mm2.layers["voxels"]
        assert v2.resolution == pytest.approx(0.25)
        assert bool(v2.valid[0]) and float(v2.occupancy[0]) == pytest.approx(0.9)


class TestKitti:
    def test_roundtrip(self, tmp_path):
        pc = PointCloud.from_numpy(
            np.random.RandomState(1).randn(50, 3).astype(np.float32),
            intensity=np.linspace(0, 1, 50),
        )
        p = str(tmp_path / "scan.bin")
        save_kitti_bin(p, pc)
        pc2 = load_kitti_bin(p)
        np.testing.assert_allclose(pc2.to_numpy(), pc.to_numpy())
        np.testing.assert_allclose(pc2.intensity[:50], pc.intensity[:50],
                                   atol=1e-6)


class TestXyz:
    def test_roundtrip_gz(self, tmp_path):
        pc = PointCloud.from_numpy(
            np.random.RandomState(2).randn(30, 3).astype(np.float32)
        )
        p = str(tmp_path / "c.xyz.gz")
        save_xyz_file(p, pc)
        pc2 = load_xyz_file(p)
        np.testing.assert_allclose(pc2.to_numpy(), pc.to_numpy(), atol=1e-5)

    def test_decimation(self):
        pc = load_xyz_file(
            "/root/reference/demos/bunny_decim.xyz.gz", decimation=10
        )
        assert int(pc.count) == 1065  # 10642 points / 10, rounded up


class TestApps:
    def test_txt2mm_mm_info_mm2txt(self, tmp_path, capsys, monkeypatch):
        from mp2p_icp_tpu.apps import mm2txt, mm_info, txt2mm

        txt = tmp_path / "cloud.txt"
        data = np.random.RandomState(3).randn(20, 4).astype(np.float32)
        np.savetxt(txt, data)
        out = str(tmp_path / "cloud.mm.npz")
        assert txt2mm.main(["-i", str(txt), "-o", out, "-f", "xyzi"]) == 0
        assert mm_info.main([out]) == 0
        captured = capsys.readouterr()
        assert "20 points" in captured.out
        monkeypatch.chdir(tmp_path)
        assert mm2txt.main([out]) == 0
        exported = np.loadtxt(tmp_path / "cloud_raw.txt")
        np.testing.assert_allclose(exported[:, :3], data[:, :3], atol=1e-5)

    def test_kitti2mm(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import kitti2mm

        raw = np.random.RandomState(4).randn(40, 4).astype(np.float32)
        binf = tmp_path / "000000.bin"
        raw.tofile(binf)
        out = str(tmp_path / "000000.mm.npz")
        assert kitti2mm.main(["-i", str(binf), "-o", out]) == 0
        assert "40 points" in capsys.readouterr().out

    def test_mm_filter_pipeline_and_rename(self, tmp_path, capsys):
        import yaml as _yaml

        from mp2p_icp_tpu.apps import mm_filter

        mm = MetricMap()
        mm.layers["raw"] = PointCloud.from_numpy(
            np.random.RandomState(5).uniform(0, 4, (200, 3))
        )
        src = str(tmp_path / "in.mm.npz")
        save_mm_file(src, mm)
        pipeline = tmp_path / "p.yaml"
        pipeline.write_text(
            _yaml.safe_dump(
                [
                    {
                        "class_name": "mp2p_icp_filters::FilterDecimateVoxels",
                        "params": {
                            "voxel_filter_resolution": 1.0,
                            "output_pointcloud_layer": "decim",
                        },
                    }
                ]
            )
        )
        out = str(tmp_path / "out.mm.npz")
        assert mm_filter.main(
            ["-i", src, "-o", out, "-p", str(pipeline)]
        ) == 0
        mm2 = load_mm_file(out)
        assert "decim" in mm2.layers
        assert int(mm2.point_layer("decim").count) <= 125

        out2 = str(tmp_path / "out2.mm.npz")
        assert mm_filter.main(
            ["-i", src, "-o", out2, "--rename-layer", "raw=lidar"]
        ) == 0
        assert "lidar" in load_mm_file(out2).layers

    def test_sm2mm_app(self, tmp_path, capsys):
        import yaml as _yaml

        from mp2p_icp_tpu.apps import sm2mm_app
        from mp2p_icp_tpu.filters.generator import Observation
        from mp2p_icp_tpu.filters.sm2mm import Keyframe, SimpleMap

        sm = SimpleMap()
        for i in range(2):
            sm.keyframes.append(
                Keyframe(
                    pose=se3.from_xyz_ypr(i * 1.0, 0, 0, 0, 0, 0),
                    observations=[
                        Observation(
                            xyz=np.random.RandomState(i).randn(32, 3)
                        )
                    ],
                )
            )
        smp = str(tmp_path / "in.sm.npz")
        sm.save(smp)
        pipe = tmp_path / "pipe.yaml"
        pipe.write_text(
            _yaml.safe_dump(
                {
                    "filters": [
                        {
                            "class_name": "mp2p_icp_filters::FilterMerge",
                            "params": {
                                "input_pointcloud_layer": "raw",
                                "target_layer": "map",
                                "input_layer_in_local_coordinates": True,
                            },
                        }
                    ]
                }
            )
        )
        out = str(tmp_path / "out.mm.npz")
        assert sm2mm_app.main(
            ["-i", smp, "-o", out, "-p", str(pipe)]
        ) == 0
        mm = load_mm_file(out)
        assert int(mm.point_layer("map").count) == 64

    def test_icp_run_app(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps import icp_run

        rc = icp_run.main(
            [
                "--input-local", "/root/reference/demos/bunny_decim.xyz.gz",
                "--input-global", "/root/reference/demos/bunny_decim.xyz.gz",
                "-c", "/root/reference/demos/icp-settings-example1.yaml",
                "--guess", "0.01 0 0 0.02 0 0",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "quality     : 1.0" in out
        assert "translation : [0.0" in out.replace("-0.0", "0.0")
