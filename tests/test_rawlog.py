"""Rawlog container round-trip + rawlog-filter app end-to-end.

Mirrors the reference's apps/rawlog-filter behaviour
(apps/rawlog-filter/main.cpp:177-245): generators -> filters per
observation; output stream = original observation + out_<layer> clouds.
"""

import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.filters.generator import Observation
from mp2p_icp_tpu.io.rawlog import Rawlog, pointcloud_to_observation


def _scan(rng, n=500):
    return rng.uniform(-10, 10, (n, 3)).astype(np.float32)


class TestRawlogContainer:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        rl = Rawlog()
        rl.append(
            Observation(
                class_name="CObservationPointCloud",
                sensor_label="lidar",
                timestamp=1.5,
                xyz=_scan(rng),
                intensity=rng.rand(500).astype(np.float32),
                sensor_pose=se3.from_xyz_ypr(0.1, 0.0, 0.5, 0.0, 0.0, 0.0),
            )
        )
        rl.append(
            Observation(
                class_name="CObservationIMU",
                sensor_label="imu",
                timestamp=1.6,
                angular_velocity=(0.0, 0.0, 0.3),
            )
        )
        rl.append(
            Observation(
                class_name="CObservationComment",
                timestamp=1.7,
                text="local_velocity_buffer:\n  entries: []",
            )
        )
        path = str(tmp_path / "log.rawlog.npz")
        rl.save(path)
        rl2 = Rawlog.load(path)
        assert len(rl2) == 3
        o0 = rl2.observations[0]
        assert o0.class_name == "CObservationPointCloud"
        assert o0.sensor_label == "lidar"
        np.testing.assert_allclose(o0.xyz, rl.observations[0].xyz)
        np.testing.assert_allclose(o0.intensity, rl.observations[0].intensity)
        assert o0.sensor_pose is not None
        np.testing.assert_allclose(
            np.asarray(o0.sensor_pose.t),
            np.asarray(rl.observations[0].sensor_pose.t),
        )
        assert rl2.observations[1].angular_velocity == (0.0, 0.0, 0.3)
        assert "local_velocity_buffer" in rl2.observations[2].text
        # frame ids preserved and unique for standalone appends
        assert rl2.frames == [0, 1, 2]

    def test_pointcloud_to_observation_trims(self):
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
        pc = PointCloud.from_numpy(xyz, intensity=np.ones(10, np.float32))
        obs = pointcloud_to_observation(pc, sensor_label="out_raw")
        assert obs.xyz.shape == (10, 3)  # capacity padding trimmed
        assert obs.intensity.shape == (10,)
        np.testing.assert_allclose(obs.xyz, xyz)


class TestRawlogFilterApp:
    def test_end_to_end(self, tmp_path, capsys):
        from mp2p_icp_tpu.apps.rawlog_filter import main

        rng = np.random.RandomState(1)
        rl = Rawlog()
        for i in range(3):
            rl.append(
                Observation(
                    class_name="CObservationPointCloud",
                    sensor_label="lidar",
                    timestamp=float(i),
                    xyz=_scan(rng, 800),
                )
            )
        inp = str(tmp_path / "in.rawlog.npz")
        rl.save(inp)

        pipeline = tmp_path / "pipeline.yaml"
        pipeline.write_text(
            """
generators:
  - class_name: Generator
    params:
      target_layer: raw
filters:
  - class_name: FilterDecimateVoxels
    params:
      input_pointcloud_layer: raw
      output_pointcloud_layer: decimated
      voxel_filter_resolution: 2.0
      decimate_method: DecimateMethod::FirstPoint
"""
        )
        outp = str(tmp_path / "out.rawlog.npz")
        assert main(["-i", inp, "-o", outp, "-p", str(pipeline)]) == 0

        out = Rawlog.load(outp)
        # each input obs -> frame of (original, out_decimated, out_raw)
        assert len(out) == 9
        labels = [o.sensor_label for o in out.observations[:3]]
        assert labels == ["lidar", "out_decimated", "out_raw"]
        assert out.frames[:3] == [0, 0, 0] and out.frames[3:6] == [1, 1, 1]
        dec = out.observations[1]
        orig = out.observations[0]
        assert 0 < dec.xyz.shape[0] < orig.xyz.shape[0]

    def test_range_and_unhandled(self, tmp_path):
        from mp2p_icp_tpu.apps.rawlog_filter import main

        rng = np.random.RandomState(2)
        rl = Rawlog()
        rl.append(Observation(class_name="CObservationIMU", timestamp=0.0,
                              angular_velocity=(0, 0, 0)))
        for i in range(4):
            rl.append(
                Observation(
                    class_name="CObservationPointCloud",
                    sensor_label="lidar",
                    timestamp=float(i),
                    xyz=_scan(rng, 300),
                )
            )
        inp = str(tmp_path / "in.rawlog.npz")
        rl.save(inp)
        pipeline = tmp_path / "p.yaml"
        pipeline.write_text("filters: []\n")
        outp = str(tmp_path / "out.rawlog.npz")
        # indices 0..2: IMU (unhandled, skipped) + two clouds
        assert main(["-i", inp, "-o", outp, "-p", str(pipeline),
                     "--from", "0", "--to", "2"]) == 0
        out = Rawlog.load(outp)
        # 2 handled clouds x (original + out_raw)
        assert len(out) == 4
        assert {o.sensor_label for o in out.observations} == {
            "lidar", "out_raw"
        }
