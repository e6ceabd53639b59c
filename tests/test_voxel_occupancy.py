"""Voxel occupancy map + occupancy-based filter tests (reference:
CVoxelMap/Bonxai behaviors in sm2mm pipelines + static/dynamic split)."""

import numpy as np
import jax.numpy as jnp

from mp2p_icp_tpu.core.metric_map import VoxelGridLayer
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.curvature import FilterCurvature
from mp2p_icp_tpu.filters.decimate_variants import (
    FilterDecimateAdaptive,
    FilterDecimateVoxelsQuadratic,
)
from mp2p_icp_tpu.filters.edges_planes import FilterEdgesPlanes
from mp2p_icp_tpu.filters.voxel_filters import (
    FilterRemoveByVoxelOccupancy,
    FilterVoxelSlice,
    GeneratorVoxelMap,
)
from mp2p_icp_tpu.ops.voxel_occupancy import lookup_occupancy, update_voxel_map


class TestVoxelMapUpdate:
    def test_hits_become_occupied(self):
        vg = VoxelGridLayer.empty(256, resolution=0.5)
        pts = jnp.asarray([[2.1, 0.1, 0.1]] * 5, jnp.float32)
        vg = update_voxel_map(
            vg, pts, jnp.ones(5, bool), jnp.zeros(3), carve_free_space=False
        )
        occ = lookup_occupancy(vg, jnp.asarray([[2.1, 0.1, 0.1]]))
        assert float(occ[0]) > 0.9

    def test_free_space_carved(self):
        vg = VoxelGridLayer.empty(1024, resolution=0.5)
        # rays to x=4: the voxel at x=2 lies mid-ray -> carved free
        pts = jnp.asarray([[4.0, 0.1, 0.1]] * 10, jnp.float32)
        for _ in range(3):
            vg = update_voxel_map(vg, pts, jnp.ones(10, bool), jnp.zeros(3))
        occ_mid = lookup_occupancy(vg, jnp.asarray([[2.0, 0.1, 0.1]]))
        occ_end = lookup_occupancy(vg, jnp.asarray([[4.0, 0.1, 0.1]]))
        assert float(occ_mid[0]) < 0.3
        assert float(occ_end[0]) > 0.8

    def test_unknown_is_default(self):
        vg = VoxelGridLayer.empty(64, resolution=0.5)
        occ = lookup_occupancy(vg, jnp.asarray([[9.0, 9.0, 9.0]]))
        assert float(occ[0]) == 0.5


class TestStaticDynamicSplit:
    def test_split(self):
        # map: wall at x=4 observed many times; later a transient at x=2
        vg = VoxelGridLayer.empty(1024, resolution=0.5)
        wall = jnp.asarray([[4.0, y, 0.1] for y in np.linspace(-1, 1, 20)],
                           jnp.float32)
        for _ in range(4):
            vg = update_voxel_map(vg, wall, jnp.ones(20, bool), jnp.zeros(3))
        scan = PointCloud.from_numpy(
            np.array([[4.0, 0.0, 0.1], [2.0, 0.0, 0.1]], np.float32)
        )
        f = FilterRemoveByVoxelOccupancy(
            input_pointcloud_layer="scan",
            input_voxel_layer="vox",
            output_layer_static_objects="static",
            output_layer_dynamic_objects="dynamic",
        )
        out = f({"scan": scan, "vox": vg})
        assert int(out["static"].count) == 1
        assert int(out["dynamic"].count) == 1
        np.testing.assert_allclose(out["static"].to_numpy()[0][0], 4.0)
        np.testing.assert_allclose(out["dynamic"].to_numpy()[0][0], 2.0)


class TestVoxelSlice:
    def test_slice(self):
        vg = VoxelGridLayer.empty(256, resolution=0.5)
        pts = jnp.asarray([[1.0, 1.0, 0.2], [2.0, -1.0, 5.0]], jnp.float32)
        vg = update_voxel_map(
            vg, pts, jnp.ones(2, bool), jnp.zeros(3), carve_free_space=False
        )
        f = FilterVoxelSlice(
            input_layer="vox", output_layer="grid",
            slice_z_min=0.0, slice_z_max=1.0, grid_half_extent=5.0,
        )
        out = f({"vox": vg})
        grid = out["grid"]
        assert grid.occupancy.shape == (20, 20)
        # the z=0.2 voxel is in-slice -> some cell above prior (one hit =
        # sigmoid(L_HIT) ~ 0.77); z=5 voxel excluded from the slice
        assert float(jnp.max(grid.occupancy)) > 0.7
        assert int(jnp.sum(grid.occupancy > 0.7)) == 1


class TestGeneratorVoxelMap:
    def test_accumulates(self):
        scan = PointCloud.from_numpy(
            np.random.RandomState(0).uniform(2, 4, (64, 3)).astype(np.float32)
        )
        g = GeneratorVoxelMap(
            input_pointcloud_layer="raw", output_voxel_layer="vox",
            resolution=0.5, capacity=4096, carve_free_space=False,
        )
        layers = g({"raw": scan})
        vg = layers["vox"]
        assert int(jnp.sum(vg.valid)) > 0
        occ = lookup_occupancy(vg, scan.xyz[:5])
        assert (np.asarray(occ) > 0.5).all()


class TestEdgesPlanes:
    def test_classifies_plane_and_edge(self):
        rng = np.random.RandomState(0)
        # vertical wall (plane, non-horizontal normal); compact blob
        # ("edge" by the reference's e2 < 30*e0 criterion — note the
        # reference's default edge class selects near-isotropic clusters,
        # NOT thin lines); and a thin pole, which the reference's default
        # thresholds drop entirely (e2/e0 huge, e1/e0 < 100).
        wall = np.stack(
            [rng.uniform(4.9, 5.1, 400), rng.uniform(-2, 2, 400),
             rng.uniform(0, 2, 400)], 1)
        blob = rng.normal(0, 0.05, (50, 3)) + [[2.0, 1.0, 0.5]]
        pole = np.stack(
            [np.full(100, -3.0) + rng.normal(0, 0.005, 100),
             np.full(100, 1.0) + rng.normal(0, 0.005, 100),
             rng.uniform(0, 0.99, 100)], 1)
        pc = PointCloud.from_numpy(
            np.concatenate([wall, blob, pole]).astype(np.float32)
        )
        f = FilterEdgesPlanes(voxel_filter_resolution=1.0,
                              full_pointcloud_decimation=10)
        out = f({"raw": pc})
        assert int(out["plane_points"].count) > 100
        edges = out["edge_points"].to_numpy()
        assert len(edges) >= 10
        # edges come from the blob, not the pole
        assert (np.abs(edges[:, 0] - 2.0) < 0.5).all()
        assert int(out["full_decim"].count) > 0
        planes = out["_planes"]
        assert int(planes.count) >= 1
        # wall normal ~ +-x
        n0 = np.asarray(planes.normal[0])
        assert abs(n0[0]) > 0.9

    def test_horizontal_plane_points_dropped(self):
        rng = np.random.RandomState(1)
        ground = np.stack(
            [rng.uniform(-3, 3, 500), rng.uniform(-3, 3, 500),
             rng.normal(0.0, 0.01, 500)], 1).astype(np.float32)
        # ground plane at z=0 -> plane recorded but points dropped
        pc = PointCloud.from_numpy(ground)
        f = FilterEdgesPlanes(voxel_filter_resolution=2.0)
        out = f({"raw": pc})
        assert int(out["_planes"].count) >= 1
        assert int(out["plane_points"].count) == 0


class TestCurvature:
    def test_corner_detected(self):
        # single ring tracing an L-shape: corner has high curvature
        t1 = np.linspace(0, 1, 30)
        leg1 = np.stack([t1, np.zeros_like(t1), np.zeros_like(t1)], 1)
        leg2 = np.stack([np.ones_like(t1), t1, np.zeros_like(t1)], 1)
        xyz = np.concatenate([leg1, leg2]).astype(np.float32) + [[1, 1, 0]]
        pc = PointCloud.from_numpy(xyz, ring=np.zeros(60))
        f = FilterCurvature(
            output_layer_larger_curvature="edges",
            output_layer_smaller_curvature="flat",
            min_clearance=0.001,
            max_cosine=0.5,
        )
        out = f({"raw": pc})
        n_edges = int(out["edges"].count)
        n_flat = int(out["flat"].count)
        assert n_flat > 40  # straight legs
        assert 1 <= n_edges <= 10  # the corner (+ ring wrap ends)
        # corner point (2,1,0) must be among edges
        e = out["edges"].to_numpy()
        assert any(np.allclose(p, [2, 1, 0], atol=0.05) for p in e)

    def test_requires_ring(self):
        pc = PointCloud.from_numpy(np.zeros((4, 3)))
        import pytest

        with pytest.raises(ValueError):
            FilterCurvature(output_layer_larger_curvature="e")({"raw": pc})


class TestDecimateVariants:
    def test_quadratic_keeps_near_detail(self):
        rng = np.random.RandomState(2)
        near = rng.uniform(0, 2, (300, 3)).astype(np.float32)
        far = (rng.uniform(0, 2, (300, 3)) + [[50, 0, 0]]).astype(np.float32)
        pc = PointCloud.from_numpy(np.concatenate([near, far]))
        f = FilterDecimateVoxelsQuadratic(
            voxel_filter_resolution=0.25, quadratic_reference_radius=5.0
        )
        out = f({"raw": pc})["decimated"]
        pts = out.to_numpy()
        n_near = (pts[:, 0] < 10).sum()
        n_far = (pts[:, 0] > 10).sum()
        assert n_near > 3 * n_far  # far region collapsed much harder

    def test_adaptive_hits_target(self):
        rng = np.random.RandomState(3)
        pc = PointCloud.from_numpy(
            rng.uniform(0, 20, (2000, 3)).astype(np.float32)
        )
        f = FilterDecimateAdaptive(desired_output_point_count=300)
        out = f({"raw": pc})["decimated"]
        n = int(out.count)
        assert 100 <= n <= 900  # right order of magnitude


class TestPoleDetector:
    def test_detects_pole(self):
        from mp2p_icp_tpu.filters.pole_detector import FilterPoleDetector

        rng = np.random.RandomState(5)
        # flat ground everywhere + a tall pole in one cell
        ground = np.stack(
            [rng.uniform(-10, 10, 2000), rng.uniform(-10, 10, 2000),
             rng.normal(0, 0.05, 2000)], 1)
        pole = np.stack(
            [np.full(50, 3.0) + rng.normal(0, 0.1, 50),
             np.full(50, 3.0) + rng.normal(0, 0.1, 50),
             rng.uniform(3.0, 8.0, 50)], 1)
        pc = PointCloud.from_numpy(
            np.concatenate([ground, pole]).astype(np.float32))
        f = FilterPoleDetector(
            output_layer_poles="poles", output_layer_no_poles="rest",
            grid_size=2.0, minimum_relative_height=2.5,
        )
        out = f({"raw": pc})
        poles = out["poles"].to_numpy()
        assert len(poles) >= 40
        # pole points are near (3, 3) and high up on average
        assert np.linalg.norm(poles[:, :2].mean(0) - [3, 3]) < 1.5
        assert int(out["rest"].count) >= 1900

    def test_no_pole_in_flat_scene(self):
        from mp2p_icp_tpu.filters.pole_detector import FilterPoleDetector

        rng = np.random.RandomState(6)
        ground = np.stack(
            [rng.uniform(-10, 10, 1000), rng.uniform(-10, 10, 1000),
             rng.normal(0, 0.05, 1000)], 1).astype(np.float32)
        f = FilterPoleDetector(output_layer_poles="poles", grid_size=2.0)
        out = f({"raw": PointCloud.from_numpy(ground)})
        assert int(out["poles"].count) == 0
