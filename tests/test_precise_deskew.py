"""Velocity-buffer -> sm2mm -> precise deskew wiring (VERDICT r1 Missing #6).

Reference chain: sm2mm reads the local velocity buffer from comment
observations (mp2p_icp_filters/src/sm2mm.cpp:95-137) and Generator feeds
IMU gyro samples into it (Generator.cpp:190-216); FilterDeskew's precise
mode interpolates the reconstructed relative trajectory
(FilterDeskew.cpp:162-240).

The scenario here is the one constant-twist CANNOT represent: the sensor's
yaw rate flips sign mid-scan, so yaw(t) = -w|t| — piecewise, not linear.
Precise deskew must recover a flat wall; constant twist must not.
"""

import numpy as np
import jax.numpy as jnp
import yaml

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.velocity_buffer import LocalVelocityBuffer
from mp2p_icp_tpu.filters.deskew import FilterDeskew
from mp2p_icp_tpu.filters.generator import Observation
from mp2p_icp_tpu.filters.sm2mm import (
    Keyframe,
    SimpleMap,
    simplemap_to_metricmap,
)

W = 1.5  # yaw rate magnitude (rad/s)
T_REF = 100.0  # absolute scan reference timestamp


def _sensor_yaw(t):
    """True sensor yaw relative to the scan reference time: the yaw rate is
    +W before t=0 and -W after -> yaw(t) = -W*|t|."""
    return -W * np.abs(t)


def _make_skewed_wall(rng, n=800):
    """A flat wall at x=5 observed while the sensor spins; raw measurements
    are expressed in the sensor frame at each point's capture time."""
    t = rng.uniform(-0.05, 0.05, n).astype(np.float32)
    world = np.stack(
        [
            np.full(n, 5.0),
            rng.uniform(-2, 2, n),
            rng.uniform(0, 2, n),
        ],
        1,
    ).astype(np.float32)
    raw = np.empty_like(world)
    for i in range(n):
        yaw = _sensor_yaw(t[i])
        c, s = np.cos(yaw), np.sin(yaw)
        # sensor frame at time t -> raw = R(yaw)^-1 @ world
        x, y = world[i, 0], world[i, 1]
        raw[i] = [c * x + s * y, -s * x + c * y, world[i, 2]]
    return raw, t, world


def _buffer_yaml():
    buf = LocalVelocityBuffer(max_time_window=1.0)
    for ti in np.arange(-0.08, 0.081, 0.005):
        wz = W if ti < 0 else -W
        buf.add_angular_velocity(T_REF + ti, (0.0, 0.0, wz))
    return yaml.safe_dump({"local_velocity_buffer": buf.to_yaml_dict()})


def _wall_flatness(pc):
    xyz = np.asarray(pc.xyz[: int(pc.count)])
    return float(np.std(xyz[:, 0]))


class TestPreciseDeskew:
    def _run(self, use_precise, via_imu=False):
        rng = np.random.RandomState(8)
        raw, t, world = _make_skewed_wall(rng)
        obs = [
            Observation(
                class_name="CObservationPointCloud",
                timestamp=T_REF,
                xyz=raw,
                time=t,
            )
        ]
        if via_imu:
            for ti in np.arange(-0.08, 0.081, 0.005):
                wz = W if ti < 0 else -W
                obs.insert(
                    0,
                    Observation(
                        class_name="CObservationIMU",
                        timestamp=T_REF + ti,
                        angular_velocity=(0.0, 0.0, wz),
                    ),
                )
        else:
            obs.insert(
                0,
                Observation(
                    class_name="CObservationComment",
                    timestamp=T_REF,
                    text=_buffer_yaml(),
                ),
            )
        sm = SimpleMap(keyframes=[Keyframe(pose=se3.identity(),
                                           observations=obs)])
        pipeline = {
            "generators": None,
            "filters": [
                {
                    "class_name": "FilterDeskew",
                    "params": {
                        "input_pointcloud_layer": "raw",
                        "output_pointcloud_layer": "deskewed",
                        "use_precise_local_velocities": bool(use_precise),
                    },
                }
            ],
        }
        mm = simplemap_to_metricmap(sm, pipeline)
        return mm.layers["deskewed"]

    def test_precise_recovers_wall_constant_twist_cannot(self):
        flat_precise = _wall_flatness(self._run(use_precise=True))
        flat_const = _wall_flatness(self._run(use_precise=False))
        # skew magnitude: yaw up to 0.075 rad at 5 m -> ~0.15 m x-std raw
        assert flat_precise < 0.02, flat_precise
        assert flat_const > 5 * flat_precise, (flat_const, flat_precise)

    def test_imu_observations_feed_buffer(self):
        flat = _wall_flatness(self._run(use_precise=True, via_imu=True))
        assert flat < 0.02, flat

    def test_simplemap_roundtrips_comment_and_imu(self, tmp_path):
        sm = SimpleMap(
            keyframes=[
                Keyframe(
                    pose=se3.identity(),
                    observations=[
                        Observation(
                            class_name="CObservationComment",
                            text="hello: 1\n",
                        ),
                        Observation(
                            class_name="CObservationIMU",
                            timestamp=3.5,
                            angular_velocity=(0.1, 0.2, 0.3),
                            linear_velocity=(1.0, 0.0, 0.0),
                        ),
                    ],
                )
            ]
        )
        p = str(tmp_path / "t.sm.npz")
        sm.save(p)
        sm2 = SimpleMap.load(p)
        o0, o1 = sm2.keyframes[0].observations
        assert o0.text == "hello: 1\n"
        assert o1.angular_velocity == (0.1, 0.2, 0.3)
        assert o1.linear_velocity == (1.0, 0.0, 0.0)

    def test_filter_falls_back_without_trajectory(self):
        """No trajectory in variables -> constant-twist fallback (reference:
        FilterDeskew.cpp:178-184 throttled warning + fallback)."""
        rng = np.random.RandomState(9)
        raw, t, _ = _make_skewed_wall(rng, n=100)
        from mp2p_icp_tpu.core.pointcloud import PointCloud

        pc = PointCloud.from_numpy(raw, time=t)
        f = FilterDeskew(use_precise_local_velocities=True)
        out = f({"raw": pc}, {"vx": 0.0})
        assert "deskewed" in out  # no crash, identity-ish correction
