"""sm2mm pipeline + generator + velocity buffer tests (reference: sm2mm.cpp,
Generator.cpp, test-mp2p_velocity_buffer.cpp)."""

import numpy as np
import pytest
import yaml

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.velocity_buffer import LocalVelocityBuffer
from mp2p_icp_tpu.filters.generator import (
    Generator,
    Observation,
    apply_generators,
    generators_from_yaml,
)
from mp2p_icp_tpu.filters.sm2mm import (
    Keyframe,
    SimpleMap,
    Sm2MmOptions,
    simplemap_to_metricmap,
)


class TestGenerator:
    def test_default_inserts_raw(self):
        mm = MetricMap()
        obs = Observation(xyz=np.ones((5, 3), np.float32))
        assert apply_generators([Generator()], obs, mm)
        assert int(mm.point_layer("raw").count) == 5

    def test_class_regex_gating(self):
        g = Generator(process_class_names_regex="CObservationVelodyneScan")
        mm = MetricMap()
        obs = Observation(
            class_name="CObservation2DRangeScan", xyz=np.ones((3, 3))
        )
        assert not apply_generators([g], obs, mm)
        obs2 = Observation(
            class_name="CObservationVelodyneScan", xyz=np.ones((3, 3))
        )
        assert apply_generators([g], obs2, mm)

    def test_sensor_label_gating(self):
        g = Generator(process_sensor_labels_regex="lidar_front")
        mm = MetricMap()
        assert not g.process(
            Observation(sensor_label="lidar_rear", xyz=np.ones((2, 3))), mm
        )
        assert g.process(
            Observation(sensor_label="lidar_front", xyz=np.ones((2, 3))), mm
        )

    def test_sensor_pose_applied(self):
        g = Generator()
        mm = MetricMap()
        import jax.numpy as jnp

        pose = se3.Pose(jnp.eye(3), jnp.asarray([10.0, 0, 0]))
        g.process(Observation(xyz=np.zeros((2, 3)), sensor_pose=pose), mm)
        np.testing.assert_allclose(
            mm.point_layer("raw").to_numpy(), [[10, 0, 0]] * 2
        )

    def test_from_yaml(self):
        gens = generators_from_yaml(
            yaml.safe_load(
                """
- class_name: mp2p_icp_filters::Generator
  params:
    target_layer: 'scan'
    process_class_names_regex: '.*Velodyne.*'
"""
            )
        )
        assert gens[0].target_layer == "scan"


PIPELINE = yaml.safe_load(
    """
generators:
  - class_name: mp2p_icp_filters::Generator
    params:
      target_layer: 'raw'
filters:
  - class_name: mp2p_icp_filters::FilterMerge
    params:
      input_pointcloud_layer: 'raw'
      target_layer: 'map'
      input_layer_in_local_coordinates: true
final_filters:
  - class_name: mp2p_icp_filters::FilterDecimateVoxels
    params:
      input_pointcloud_layer: 'map'
      output_pointcloud_layer: 'map_decim'
      voxel_filter_resolution: 0.5
"""
)


class TestSm2Mm:
    def make_sm(self, n_kfs=3):
        sm = SimpleMap()
        rng = np.random.RandomState(0)
        for i in range(n_kfs):
            pose = se3.from_xyz_ypr(float(i) * 2.0, 0, 0, 0, 0, 0)
            obs = Observation(xyz=rng.uniform(-1, 1, (64, 3)))
            sm.keyframes.append(Keyframe(pose=pose, observations=[obs]))
        return sm

    def test_builds_accumulated_map(self):
        sm = self.make_sm()
        mm = simplemap_to_metricmap(sm, PIPELINE)
        assert "map" in mm.layers
        assert int(mm.point_layer("map").count) == 3 * 64
        assert "map_decim" in mm.layers
        # keyframes at x = 0, 2, 4 -> map spans ~[-1, 5]
        pts = mm.point_layer("map").to_numpy()
        assert pts[:, 0].max() > 3.5

    def test_index_range(self):
        sm = self.make_sm()
        mm = simplemap_to_metricmap(
            sm, PIPELINE, Sm2MmOptions(start_index=1, end_index=2)
        )
        assert int(mm.point_layer("map").count) == 64

    def test_save_load_roundtrip(self, tmp_path):
        sm = self.make_sm(2)
        sm.keyframes[0].twist = (1, 0, 0, 0, 0, 0.1)
        p = str(tmp_path / "test.sm.npz")
        sm.save(p)
        sm2 = SimpleMap.load(p)
        assert len(sm2.keyframes) == 2
        assert sm2.keyframes[0].twist == (1, 0, 0, 0, 0, 0.1)
        np.testing.assert_allclose(
            sm2.keyframes[0].observations[0].xyz,
            sm.keyframes[0].observations[0].xyz,
        )


class TestVelocityBuffer:
    def test_window_trim(self):
        buf = LocalVelocityBuffer(max_time_window=1.0)
        buf.add_linear_velocity(0.0, [1, 0, 0])
        buf.add_linear_velocity(2.0, [2, 0, 0])
        assert not buf.empty()
        # first sample fell out of the window
        assert 0.0 not in buf._lin and 2.0 in buf._lin

    def test_reconstruct_constant_velocity(self):
        buf = LocalVelocityBuffer()
        for t in np.arange(0, 0.2, 0.01):
            buf.add_linear_velocity(t, [2.0, 0, 0])  # 2 m/s in +x
        times, tangents = buf.reconstruct_poses_around_reference_time(
            0.1, half_window=0.05, dt=0.01
        )
        # at +0.05 s: moved 0.1 m
        i = np.argmin(np.abs(times - 0.15))
        np.testing.assert_allclose(tangents[i, 0], 0.1, atol=1e-3)
        # at -0.05 s: moved -0.1 m
        j = np.argmin(np.abs(times - 0.05))
        np.testing.assert_allclose(tangents[j, 0], -0.1, atol=1e-3)

    def test_yaml_roundtrip(self):
        buf = LocalVelocityBuffer()
        buf.add_linear_velocity(1.0, [1, 2, 3])
        buf.add_angular_velocity(1.0, [0.1, 0, 0])
        buf2 = LocalVelocityBuffer.from_yaml_dict(buf.to_yaml_dict())
        np.testing.assert_allclose(buf2._lin[1.0], [1, 2, 3])
        np.testing.assert_allclose(buf2._ang[1.0], [0.1, 0, 0])
