"""Generator observation decode + custom map definitions (VERDICT r1
Missing #2).

Reference: mp2p_icp_filters/src/Generator.cpp — 2D range scans are
projected to points by the general insertObservationInto path (:447-487),
rotating scans arrive as organized range images (:264-275 hook +
CObservationRotatingScan), and YAML ``metric_map_definition`` builds
arbitrary layer classes (:492-612). The 2D-lidar e2e mirrors
/root/reference/demos/icp-settings-2d-lidar-example-point2line.yaml.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.metric_map import MetricMap, VoxelGridLayer
from mp2p_icp_tpu.filters.generator import (
    Generator,
    Observation,
    apply_generators,
    decode_rotating_scan,
    decode_scan2d,
    generators_from_yaml,
)


# ----------------------------------------------------------- 2D scan decode
class TestScan2DDecode:
    def test_polar_projection(self):
        """Ranges at known bearings land at r*(cos a, sin a, 0)."""
        n = 181
        ranges = np.full(n, 4.0, np.float32)
        obs = Observation(
            class_name="CObservation2DRangeScan",
            scan_ranges=ranges,
            aperture=np.pi,
            max_range=20.0,
        )
        pts, _, _, _ = decode_scan2d(obs)
        assert pts.shape == (n, 3)
        np.testing.assert_allclose(np.linalg.norm(pts[:, :2], axis=1), 4.0,
                                   atol=1e-5)
        np.testing.assert_allclose(pts[:, 2], 0.0)
        # first beam at -aperture/2, middle at 0, last at +aperture/2
        np.testing.assert_allclose(pts[n // 2], [4.0, 0.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(pts[0, 1], -4.0, atol=1e-5)
        np.testing.assert_allclose(pts[-1, 1], 4.0, atol=1e-5)

    def test_invalid_and_out_of_range_dropped(self):
        ranges = np.array([1.0, 0.0, 5.0, 100.0], np.float32)
        valid = np.array([True, True, False, True])
        obs = Observation(
            class_name="CObservation2DRangeScan",
            scan_ranges=ranges,
            scan_valid=valid,
            max_range=80.0,
        )
        pts, _, _, _ = decode_scan2d(obs)
        assert pts.shape[0] == 1  # only the 1.0 m return survives

    def test_generator_inserts_2d_scan_with_sensor_pose(self):
        obs = Observation(
            class_name="CObservation2DRangeScan",
            scan_ranges=np.full(11, 2.0, np.float32),
            aperture=np.pi / 2,
            sensor_pose=se3.from_xyz_ypr(0, 0, 1.0, 0, 0, 0),
        )
        mm = MetricMap()
        assert apply_generators([Generator(target_layer="2d_lidar")], obs, mm)
        pc = mm.layers["2d_lidar"]
        xyz = np.asarray(pc.xyz[: int(pc.count)])
        np.testing.assert_allclose(xyz[:, 2], 1.0, atol=1e-6)


# ------------------------------------------------------ rotating scan decode
class TestRotatingScanDecode:
    def test_organized_image_to_points(self):
        rows, cols = 4, 360
        R = np.full((rows, cols), 10.0, np.float32)
        R[1, 5] = 0.0  # no-return hole
        el = np.deg2rad([-2.0, 0.0, 2.0, 4.0]).astype(np.float32)
        obs = Observation(
            class_name="CObservationRotatingScan",
            range_image=R,
            elevation_angles=el,
            sweep_duration=0.1,
        )
        pts, inten, ring, t = decode_rotating_scan(obs)
        assert pts.shape[0] == rows * cols - 1
        np.testing.assert_allclose(
            np.linalg.norm(pts, axis=1), 10.0, atol=1e-4
        )
        assert ring.min() == 0 and ring.max() == rows - 1
        assert t.min() >= 0 and t.max() <= 0.1
        # rings at the right elevation
        z_by_ring = {int(r): pts[ring == r][:, 2] for r in range(rows)}
        np.testing.assert_allclose(
            np.unique(np.round(z_by_ring[1], 4)), 0.0, atol=1e-3
        )

    def test_generator_dispatches_rotating_scan(self):
        obs = Observation(
            class_name="CObservationRotatingScan",
            range_image=np.full((2, 16), 3.0, np.float32),
            sweep_duration=0.1,
        )
        mm = MetricMap()
        assert apply_generators([Generator()], obs, mm)
        pc = mm.layers["raw"]
        assert int(pc.count) == 32
        assert pc.ring is not None and pc.time is not None


# ------------------------------------------------------- custom map defs
class TestMetricMapDefinition:
    def test_voxel_map_layer_from_yaml(self):
        gens = generators_from_yaml(
            [
                {
                    "class_name": "Generator",
                    "params": {
                        "target_layer": "voxels",
                        "metric_map_definition": {
                            "class": "mrpt::maps::CVoxelMap",
                            "creationOpts": {
                                "resolution": 0.5,
                                "capacity": 4096,
                            },
                            "insertOpts": {"ray_trace": False},
                        },
                    },
                }
            ]
        )
        rng = np.random.RandomState(0)
        obs = Observation(
            xyz=rng.uniform(-3, 3, (500, 3)).astype(np.float32)
        )
        mm = MetricMap()
        assert apply_generators(gens, obs, mm)
        vg = mm.layers["voxels"]
        assert isinstance(vg, VoxelGridLayer)
        assert float(jnp.sum(vg.valid)) > 0

    def test_point_map_definition_accumulates(self):
        g = Generator(
            target_layer="pts",
            metric_map_definition=(("class", "CSimplePointsMap"),),
        )
        mm = MetricMap()
        o1 = Observation(xyz=np.zeros((10, 3), np.float32))
        o2 = Observation(xyz=np.ones((20, 3), np.float32))
        assert g.process(o1, mm) and g.process(o2, mm)
        assert int(mm.layers["pts"].count) == 30

    def test_unknown_class_throws_when_configured(self):
        g = Generator(
            target_layer="x",
            metric_map_definition=(("class", "CWeirdMap"),),
            throw_on_unhandled_observation_class=True,
        )
        with pytest.raises(ValueError):
            g.process(Observation(xyz=np.zeros((3, 3), np.float32)),
                      MetricMap())

    def test_throw_on_unhandled_pointless_observation(self):
        g = Generator(throw_on_unhandled_observation_class=True)
        with pytest.raises(ValueError):
            g.process(Observation(class_name="CObservationOdometry"),
                      MetricMap())


# ------------------------------------------------------------- 2D-lidar e2e
def _room_scan2d(pose, rng, n=720, noise=0.003):
    """Simulate a 2D lidar inside a 10x6 rectangular room with one interior
    wall stub: cast rays from `pose` and intersect with the wall segments."""
    segs = [
        ((-5, -3), (5, -3)),
        ((5, -3), (5, 3)),
        ((5, 3), (-5, 3)),
        ((-5, 3), (-5, -3)),
        ((0, -3), (0, -1)),  # interior stub breaks symmetry
    ]
    R = np.asarray(pose.R)
    t = np.asarray(pose.t)
    yaw = np.arctan2(R[1, 0], R[0, 0])
    angles = (np.arange(n) / (n - 1) - 0.5) * 2 * np.pi
    ranges = np.full(n, 0.0, np.float32)
    for i, a in enumerate(angles):
        d = np.array([np.cos(a + yaw), np.sin(a + yaw)])
        o = t[:2]
        best = np.inf
        for (p0, p1) in segs:
            p0 = np.asarray(p0, float)
            p1 = np.asarray(p1, float)
            v = p1 - p0
            M = np.array([[d[0], -v[0]], [d[1], -v[1]]])
            det = np.linalg.det(M)
            if abs(det) < 1e-12:
                continue
            s, u = np.linalg.solve(M, p0 - o)
            if s > 1e-6 and 0 <= u <= 1:
                best = min(best, s)
        if np.isfinite(best):
            ranges[i] = best + noise * rng.randn()
    return ranges.astype(np.float32)


class Test2DLidarE2E:
    def test_point2line_room_registration(self):
        """The reference 2D-lidar demo equivalent: two scans of a room from
        nearby poses, registered with Matcher_Point2Line + GN via the
        reference-schema YAML (demos/icp-settings-2d-lidar-point2line.yaml),
        reference accuracy bound |log| < 0.1."""
        import os

        from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

        cfg = os.path.join(
            os.path.dirname(__file__), "..", "demos",
            "icp-settings-2d-lidar-point2line.yaml",
        )
        icp, params, sections = load_icp_config_file(cfg)
        gens = sections["generators"]
        assert gens and gens[0].target_layer == "2d_lidar"

        rng = np.random.RandomState(5)
        g_pose = se3.identity()
        gt = se3.from_xyz_ypr(0.15, -0.10, 0.0, 0.06, 0.0, 0.0)

        def scan_to_mm(pose):
            ranges = _room_scan2d(pose, rng)
            obs = Observation(
                class_name="CObservation2DRangeScan",
                scan_ranges=ranges,
                scan_valid=ranges > 0,
                aperture=2 * np.pi,
                max_range=50.0,
            )
            mm = MetricMap()
            assert apply_generators(gens, obs, mm)
            return mm

        g_mm = scan_to_mm(g_pose)
        l_mm = scan_to_mm(gt)  # sensor at gt; scan in sensor frame
        res = icp.align(l_mm, g_mm, se3.identity(), params)
        err = float(se3.error_log_norm(gt, res.optimal_tf))
        assert err < 0.1, err
        # two matchers both count potential pairings, halving the ratio
        assert float(res.quality) > 0.4
