"""Filter pipeline tests (reference: mp2p_icp_filters behaviors)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters import (
    DecimateMethod,
    FilterAdjustTimestamps,
    FilterBoundingBox,
    FilterByIntensity,
    FilterByRange,
    FilterByRing,
    FilterDecimateVoxels,
    FilterDeleteLayer,
    FilterDeskew,
    FilterMerge,
    FilterNormalizeIntensity,
    apply_filter_pipeline,
)
from mp2p_icp_tpu.filters.adjust_timestamps import TimestampAdjustMethod


def cloud(xyz, **kw):
    return PointCloud.from_numpy(np.asarray(xyz, np.float32), **kw)


class TestDecimateVoxels:
    def grid_cloud(self):
        # 4 distinct voxels at res=1.0, with multiple points per voxel
        pts = [
            [0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.1, 0.4],  # voxel (0,0,0)
            [1.5, 0.5, 0.5], [1.6, 0.4, 0.3],                   # voxel (1,0,0)
            [0.5, 1.5, 0.5],                                    # voxel (0,1,0)
            [2.5, 2.5, 2.5],                                    # voxel (2,2,2)
        ]
        return cloud(pts)

    @pytest.mark.parametrize("method", list(DecimateMethod))
    def test_voxel_count(self, method):
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0, decimate_method=method
        )
        out = f({"raw": self.grid_cloud()})
        assert int(out["decimated"].count) == 4

    def test_first_point_picks_lowest_index(self):
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0,
            decimate_method=DecimateMethod.FIRST_POINT,
        )
        out = f({"raw": self.grid_cloud()})
        pts = out["decimated"].to_numpy()
        # first point of voxel (0,0,0) is [0.1, 0.1, 0.1]
        assert any(np.allclose(p, [0.1, 0.1, 0.1]) for p in pts)
        # first point of voxel (1,0,0) is [1.5, 0.5, 0.5]
        assert any(np.allclose(p, [1.5, 0.5, 0.5]) for p in pts)

    def test_voxel_average(self):
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0,
            decimate_method=DecimateMethod.VOXEL_AVERAGE,
        )
        out = f({"raw": self.grid_cloud()})
        pts = out["decimated"].to_numpy()
        expect = np.mean([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.1, 0.4]], 0)
        assert any(np.allclose(p, expect, atol=1e-5) for p in pts)

    def test_closest_to_average_is_real_point(self):
        src = self.grid_cloud()
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0,
            decimate_method=DecimateMethod.CLOSEST_TO_AVERAGE,
        )
        out = f({"raw": src})
        src_pts = src.to_numpy()
        for p in out["decimated"].to_numpy():
            assert any(np.allclose(p, q, atol=1e-6) for q in src_pts)

    def test_flatten_to(self):
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0, flatten_to=0.0,
            decimate_method=DecimateMethod.VOXEL_AVERAGE,
        )
        out = f({"raw": self.grid_cloud()})
        pts = out["decimated"].to_numpy()
        np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)
        # (0,0,0) & z-collapsed: voxels distinct in x,y only -> 4 in xy? cells
        # (0,0),(1,0),(0,1),(2,2) -> 4
        assert int(out["decimated"].count) == 4

    def test_channels_preserved(self):
        pc = cloud(
            [[0.1, 0, 0], [0.2, 0, 0], [5.0, 0, 0]],
            intensity=[10, 20, 30], ring=[1, 2, 3], time=[0.1, 0.2, 0.3],
        )
        f = FilterDecimateVoxels(
            voxel_filter_resolution=1.0,
            decimate_method=DecimateMethod.FIRST_POINT,
        )
        out = f({"raw": pc})["decimated"]
        assert int(out.count) == 2
        vals = set(np.asarray(out.intensity[:2]).tolist())
        assert vals == {10.0, 30.0}

    def test_bunny_decimation_matches_unique_count(self):
        from mp2p_icp_tpu.io.xyz import load_xyz_file

        pc = load_xyz_file("/root/reference/demos/bunny_decim.xyz.gz")
        res = 0.01
        f = FilterDecimateVoxels(
            voxel_filter_resolution=res,
            decimate_method=DecimateMethod.CLOSEST_TO_AVERAGE,
        )
        out = f({"raw": pc})["decimated"]
        xyz = pc.to_numpy()
        expect = len(np.unique(np.floor(xyz / res).astype(int), axis=0))
        assert int(out.count) == expect


class TestSplitsAndGates:
    def test_by_range(self):
        pc = cloud([[1, 0, 0], [5, 0, 0], [20, 0, 0]])
        f = FilterByRange(
            range_min=2, range_max=10,
            output_layer_between="near", output_layer_outside="far",
        )
        out = f({"raw": pc})
        assert int(out["near"].count) == 1
        assert int(out["far"].count) == 2
        np.testing.assert_allclose(out["near"].to_numpy(), [[5, 0, 0]])

    def test_bounding_box(self):
        pc = cloud([[0, 0, 0], [2, 2, 2], [0.5, 0.5, 0.5]])
        f = FilterBoundingBox(
            bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1),
            inside_pointcloud_layer="in", outside_pointcloud_layer="out",
        )
        out = f({"raw": pc})
        assert int(out["in"].count) == 2
        assert int(out["out"].count) == 1

    def test_by_ring(self):
        pc = cloud(np.zeros((6, 3)), ring=[0, 1, 2, 3, 2, 1])
        f = FilterByRing(
            selected_ring_ids=(1, 2), output_layer_selected="sel",
            output_layer_non_selected="rest",
        )
        out = f({"raw": pc})
        assert int(out["sel"].count) == 4
        assert int(out["rest"].count) == 2

    def test_by_intensity_and_normalize(self):
        pc = cloud(np.zeros((4, 3)), intensity=[0.0, 0.5, 0.95, 1.0])
        out = FilterByIntensity(
            low_threshold=0.1, high_threshold=0.9,
            output_layer_low_intensity="low",
            output_layer_high_intensity="high",
            output_layer_mid_intensity="mid",
        )({"raw": pc})
        assert int(out["low"].count) == 1
        assert int(out["mid"].count) == 1
        assert int(out["high"].count) == 2

        pc2 = cloud(np.zeros((3, 3)), intensity=[10, 20, 30])
        out2 = FilterNormalizeIntensity()({"raw": pc2})
        np.testing.assert_allclose(out2["raw"].intensity[:3], [0, 0.5, 1.0])


class TestDeskew:
    def test_constant_twist(self):
        # point measured at t=1 while moving +x at 1 m/s: correction +1 m
        pc = cloud([[0, 0, 0], [1, 1, 1]], time=[1.0, 0.0])
        f = FilterDeskew(twist=(1, 0, 0, 0, 0, 0))
        out = f({"raw": pc})["deskewed"]
        np.testing.assert_allclose(
            out.to_numpy(), [[1, 0, 0], [1, 1, 1]], atol=1e-6
        )

    def test_rotational_twist(self):
        # wz = pi/2 rad/s, t = 1: point rotates 90 deg about z
        pc = cloud([[1, 0, 0]], time=[1.0])
        f = FilterDeskew(twist=(0, 0, 0, 0, 0, np.pi / 2))
        out = f({"raw": pc})["deskewed"]
        np.testing.assert_allclose(out.to_numpy(), [[0, 1, 0]], atol=1e-5)

    def test_variables_override(self):
        pc = cloud([[0, 0, 0]], time=[2.0])
        f = FilterDeskew()
        out = f({"raw": pc}, variables={"vx": 0.5})["deskewed"]
        np.testing.assert_allclose(out.to_numpy(), [[1, 0, 0]], atol=1e-6)

    def test_missing_timestamps_raises(self):
        pc = cloud([[0, 0, 0]])
        with pytest.raises(ValueError):
            FilterDeskew()({"raw": pc})
        out = FilterDeskew(silently_ignore_no_timestamps=True)({"raw": pc})
        assert "deskewed" in out

    def test_fixed_axis_fast_path_equals_generic_exp(self):
        """The constant-twist branch uses closed-form fixed-axis Rodrigues
        instead of per-point se3.exp matrices — must agree to float
        precision with the generic path on a dense random cloud."""
        from mp2p_icp_tpu.core import se3 as se3m

        rng = np.random.RandomState(0)
        n = 500
        xyz = rng.randn(n, 3).astype(np.float32) * 10.0
        t = rng.rand(n).astype(np.float32) * 0.1 - 0.05
        pc = cloud(xyz, time=t)
        twist = (6.0, 0.3, -0.1, 0.2, -0.15, 0.8)
        out = FilterDeskew(twist=twist)({"raw": pc})["deskewed"]
        # generic oracle: per-point exp(t * xi) applied via matrices
        tang = t[:, None] * np.asarray(twist, np.float32)[None, :]
        poses = se3m.exp(jnp.asarray(tang))
        want = np.einsum("cij,cj->ci", np.asarray(poses.R), xyz) + np.asarray(
            poses.t
        )
        np.testing.assert_allclose(out.to_numpy(), want, atol=2e-5)

    def test_fast_path_zero_rotation(self):
        pc = cloud([[1.0, 2.0, 3.0]], time=[0.5])
        out = FilterDeskew(twist=(2, 0, 0, 0, 0, 0))({"raw": pc})["deskewed"]
        np.testing.assert_allclose(out.to_numpy(), [[2, 2, 3]], atol=1e-6)


class TestTimestamps:
    def test_middle_is_zero(self):
        pc = cloud(np.zeros((3, 3)), time=[0.0, 0.1, 0.2])
        out = FilterAdjustTimestamps(
            method=TimestampAdjustMethod.MIDDLE_IS_ZERO
        )({"raw": pc})
        np.testing.assert_allclose(
            out["raw"].time[:3], [-0.1, 0.0, 0.1], atol=1e-6
        )

    def test_normalize(self):
        pc = cloud(np.zeros((3, 3)), time=[5.0, 6.0, 7.0])
        out = FilterAdjustTimestamps(
            method=TimestampAdjustMethod.NORMALIZE
        )({"raw": pc})
        np.testing.assert_allclose(out["raw"].time[:3], [0, 0.5, 1.0], atol=1e-6)


class TestMergeDelete:
    def test_merge_with_robot_pose(self):
        scan = cloud([[1, 0, 0], [2, 0, 0]])
        f = FilterMerge(target_layer="map", target_capacity=256,
                        use_robot_pose=True)  # vehicle-frame input
        layers = f({"raw": scan}, variables={"robot_x": 10.0})
        assert int(layers["map"].count) == 2
        np.testing.assert_allclose(
            layers["map"].to_numpy(), [[11, 0, 0], [12, 0, 0]], atol=1e-5
        )
        # merge again at another pose: map grows
        layers = f({**layers, "raw": scan}, variables={"robot_x": 20.0})
        assert int(layers["map"].count) == 4

    def test_delete_layer(self):
        layers = {"raw": cloud([[0, 0, 0]]), "tmp": cloud([[1, 1, 1]])}
        out = FilterDeleteLayer(pointcloud_layer_to_remove=("tmp",))(layers)
        assert "tmp" not in out and "raw" in out
        with pytest.raises(KeyError):
            FilterDeleteLayer(pointcloud_layer_to_remove=("nope",))(layers)


class TestPipeline:
    def test_composition(self):
        pc = cloud(np.random.RandomState(0).uniform(0, 10, (500, 3)))
        pipeline = [
            FilterByRange(range_min=0, range_max=9, output_layer_between="near"),
            FilterDecimateVoxels(
                input_pointcloud_layer=("near",),
                output_pointcloud_layer="decimated",
                voxel_filter_resolution=2.0,
            ),
        ]
        out = apply_filter_pipeline(pipeline, {"raw": pc})
        assert "decimated" in out
        assert 0 < int(out["decimated"].count) <= 125 + 60


class TestEdgeGenerators:
    def test_curvature_edges(self):
        from mp2p_icp_tpu.filters.edge_generators import (
            GeneratorEdgesFromCurvature,
        )

        # L-shape in one ring with large spacing (>= clearance)
        t = np.linspace(0, 2, 11)
        leg1 = np.stack([t, np.zeros_like(t), np.zeros_like(t)], 1)
        leg2 = np.stack([np.full_like(t, 2.0) , t, np.zeros_like(t)], 1)[1:]
        xyz = np.concatenate([leg1, leg2]).astype(np.float32)
        pc = cloud(xyz, ring=np.zeros(len(xyz)))
        g = GeneratorEdgesFromCurvature(
            target_layer="edges", max_cosine=0.5, min_point_clearance=0.05
        )
        out = g({"raw": pc})
        e = out["edges"].to_numpy()
        assert len(e) >= 1
        assert any(np.allclose(p, [2, 0, 0], atol=0.05) for p in e)

    def test_range_image_edges(self):
        from mp2p_icp_tpu.filters.edge_generators import (
            GeneratorEdgesFromRangeImage,
        )

        # literal reference semantics (GeneratorEdgesFromRangeImage.cpp:
        # 127-130): score = (range_i - mean_diff)^2 / var_diff / 65536 --
        # fires where the RANGE dwarfs the windowed diff noise (range >>
        # 256 * sigma). A far ring with ~1-unit range noise scores
        # ~(5000^2/var)/65536 >> 10; a near ring with the same noise
        # scores < 10; an exactly flat ring has var == 0 and never fires.
        n = 64
        rng = np.random.RandomState(4)
        ang = np.linspace(0, np.pi / 4, n)

        def ring_at(r0, noise):
            r = r0 + noise * rng.randn(n)
            return np.stack(
                [r * np.cos(ang), r * np.sin(ang), np.zeros(n)], 1
            ).astype(np.float32)

        g = GeneratorEdgesFromRangeImage()  # defaults: thr 10, W=8, 1 cm
        # far ring, ~1.5 cm noise -> significant at 50 m
        far = cloud(ring_at(50.0, 0.015), ring=np.zeros(n))
        e_far = g({"raw": far})["edges"].to_numpy()
        assert len(e_far) > 10, len(e_far)
        # same noise at 2 m -> below threshold
        near = cloud(ring_at(2.0, 0.015), ring=np.zeros(n))
        e_near = g({"raw": near})["edges"].to_numpy()
        assert len(e_near) == 0, len(e_near)
        # exactly flat -> integer var == 0 -> never an edge
        flat = cloud(ring_at(50.0, 0.0), ring=np.zeros(n))
        e_flat = g({"raw": flat})["edges"].to_numpy()
        assert len(e_flat) == 0, len(e_flat)


class TestDeskewTrajectory:
    def test_precise_mode_matches_buffer(self):
        from mp2p_icp_tpu.core.velocity_buffer import LocalVelocityBuffer
        from mp2p_icp_tpu.filters.deskew import FilterDeskew

        buf = LocalVelocityBuffer()
        for t in np.arange(0, 0.3, 0.01):
            buf.add_linear_velocity(t, [2.0, 0, 0])
        times, tangents = buf.reconstruct_poses_around_reference_time(
            0.15, half_window=0.1, dt=0.01
        )
        pc = cloud([[0, 0, 0], [5, 0, 0]], time=[0.05 - 0.15, 0.0])
        # trajectory times are absolute; point times are relative to t_ref.
        # Translation follows the constant-velocity twist vars (reference:
        # FilterDeskew.cpp:225-237 overrides trajectory translation with
        # v*dt); rotation comes from the trajectory.
        f = FilterDeskew(method="trajectory")
        out = f(
            {"raw": pc},
            variables={
                "trajectory_times": times - 0.15,
                "trajectory_tangents": tangents,
                "vx": 2.0,
            },
        )["deskewed"]
        # point at t=-0.1: correction -0.2 m in x (moved backwards)
        np.testing.assert_allclose(
            out.to_numpy()[0], [-0.2, 0, 0], atol=5e-3
        )
        np.testing.assert_allclose(out.to_numpy()[1], [5, 0, 0], atol=5e-3)


class TestChannelPreservation:
    """I/R/T channels must survive merges (reference merge_with /
    insertAnotherMap copy full point records)."""

    def test_metric_map_merge_keeps_channels(self):
        from mp2p_icp_tpu.core.metric_map import MetricMap

        a = MetricMap()
        a.layers["raw"] = cloud(
            [[0, 0, 0], [1, 0, 0]], intensity=[0.5, 0.6],
            ring=[1, 2], time=[0.1, 0.2],
        )
        b = MetricMap()
        b.layers["raw"] = cloud(
            [[2, 0, 0]], intensity=[0.9], ring=[3], time=[0.3],
        )
        a.merge_with(b)
        pc = a.layers["raw"]
        assert pc.intensity is not None and pc.ring is not None
        n = int(pc.count)
        assert n == 3
        np.testing.assert_allclose(
            np.asarray(pc.intensity[:n]), [0.5, 0.6, 0.9]
        )
        np.testing.assert_allclose(np.asarray(pc.ring[:n]), [1, 2, 3])
        np.testing.assert_allclose(
            np.asarray(pc.time[:n]), [0.1, 0.2, 0.3]
        )

    def test_filter_merge_keeps_channels(self):
        from mp2p_icp_tpu.filters.merge import FilterMerge

        src = cloud([[0, 0, 0], [1, 0, 0]], intensity=[0.7, 0.8])
        tgt = cloud([[5, 0, 0]], intensity=[0.1])
        f = FilterMerge(input_pointcloud_layer="raw", target_layer="map")
        out = f({"raw": src, "map": tgt})
        m = out["map"]
        assert m.intensity is not None
        n = int(m.count)
        assert n == 3
        got = sorted(np.asarray(m.intensity[:n]).tolist())
        assert np.allclose(got, [0.1, 0.7, 0.8])


class TestDecimateBypassCapacities:
    def test_bypass_works_with_mismatched_capacities(self):
        from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels

        pts = np.random.RandomState(0).rand(20, 3).astype(np.float32) * 5
        pc = PointCloud.from_numpy(pts, capacity=64)
        f = FilterDecimateVoxels(
            input_pointcloud_layer=("raw",),
            output_pointcloud_layer="decimated",
            voxel_filter_resolution=1.0,
            minimum_input_points_to_filter=100,  # 20 < 100 -> passthrough
            output_capacity=256,  # != input capacity 64
        )
        out = f({"raw": pc})
        dec = out["decimated"]
        assert int(dec.count) == 20  # copied through, NOT decimated
        np.testing.assert_allclose(
            np.sort(dec.to_numpy(), axis=0), np.sort(pts, axis=0),
            rtol=1e-6,
        )


class TestDecimatePerMapBypass:
    def test_mixed_bypass_and_filter(self):
        """Reference FilterDecimateVoxels.cpp:158-192: with several input
        maps, each map <= minimum is copied VERBATIM while larger maps
        still decimate — per-map decision, not all-or-nothing."""
        from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels

        rng = np.random.RandomState(1)
        big = rng.rand(200, 3).astype(np.float32) * 3  # decimates to voxels
        small = (rng.rand(5, 3).astype(np.float32) * 3 + 100)  # bypassed
        f = FilterDecimateVoxels(
            input_pointcloud_layer=("big", "small"),
            output_pointcloud_layer="out",
            voxel_filter_resolution=1.0,
            minimum_input_points_to_filter=10,
            output_capacity=256,
        )
        out = f({
            "big": PointCloud.from_numpy(big, capacity=256),
            "small": PointCloud.from_numpy(small, capacity=8),
        })["out"]
        pts = out.to_numpy()
        # every small-map point present verbatim
        for p in small:
            assert any(np.allclose(p, q, atol=1e-6) for q in pts)
        # big map decimated: one representative per occupied voxel
        n_vox = len(np.unique(np.floor(big / 1.0).astype(int), axis=0))
        assert int(out.count) == n_vox + 5, (int(out.count), n_vox)

    def test_boundary_exactly_minimum_is_bypassed(self):
        """size == minimum is copied through (reference filters only when
        size() > minimum)."""
        from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels

        pts = np.random.RandomState(2).rand(10, 3).astype(np.float32) * 3
        f = FilterDecimateVoxels(
            input_pointcloud_layer=("raw",),
            output_pointcloud_layer="out",
            voxel_filter_resolution=1.0,
            minimum_input_points_to_filter=10,
            output_capacity=64,
        )
        out = f({"raw": PointCloud.from_numpy(pts, capacity=16)})["out"]
        assert int(out.count) == 10  # verbatim, not decimated
