"""Full map-building odometry loop (VERDICT r3 Next #1 + #2).

Drives mp2p_icp_tpu.odometry.OdometryMapper — per frame: deskew (constant
twist from variables) -> decimate -> scan-to-accumulated-map align ->
FilterMerge map update, all inside ONE jitted dispatch with a rolling
fixed-capacity map — over a LiDAR-realistic spinning-scanner sequence
(eval/lidar_sim: rings, azimuth timestamps, motion distortion, occlusion).

Gates: trajectory ATE, per-frame quality, and the EQUALITY contract — the
fused on-device map must match the host-side sm2mm filter-pipeline path
(FilterMerge with robot-pose variables, FilterMerge.cpp:96-108 /
sm2mm.cpp:159-249) run over the same estimated poses.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.eval.lidar_sim import (
    make_street_scene,
    render_spinning_scan,
    scan_to_pointcloud,
)
from mp2p_icp_tpu.eval.trajectory import ate_rmse
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels
from mp2p_icp_tpu.filters.deskew import FilterDeskew
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.matchers.base import LayerMatch
from mp2p_icp_tpu.matchers.point2plane import MatcherPoint2Plane
from mp2p_icp_tpu.odometry import OdometryMapper, reference_pipeline_map
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton

pytestmark = pytest.mark.slow  # quick loop: -m 'not slow'

N_FRAMES = 18
DT = 0.1  # scan period [s]
SPEED = 6.0  # m/s along the street
CAP = 16384  # per-scan capacity


def _make_sequence():
    """Structured spinning-LiDAR drive down the street: poses, body twists
    (ground truth — a deployment's IMU/velocity estimate), raw frames."""
    rng = np.random.RandomState(3)
    scene = make_street_scene(rng, length=120.0, n_pillars=30)
    poses, twists, frames = [], [], []
    for i in range(N_FRAMES):
        x = 10.0 + SPEED * DT * i
        yaw = 0.06 * np.sin(0.25 * i)
        pose = se3.from_xyz_ypr(x, 0.4 * np.sin(0.2 * i), 1.7, yaw, 0.0, 0.0)
        poses.append(pose)
    for i in range(N_FRAMES):
        # body twist from consecutive GT poses (what sm2mm's twist
        # entries / a velocity estimator would supply)
        j = min(i + 1, N_FRAMES - 1)
        rel = se3.compose(se3.inverse(poses[i]), poses[j])
        tw = np.asarray(se3.log(rel), np.float64) / DT
        if i == N_FRAMES - 1:
            tw = twists[-1]
        twists.append(np.asarray(tw, np.float32))
        scan = render_spinning_scan(
            scene, poses[i], twists[i], rng, n_rings=32, n_azimuth=512,
        )
        frames.append({"raw": scan_to_pointcloud(scan, capacity=CAP)})
    # the loop consumes IMU-grade twists, not ground truth: 3%
    # multiplicative + additive noise (≈2 cm/frame prediction error)
    twists = [
        np.asarray(
            tw * (1.0 + 0.03 * rng.randn(6))
            + np.array([0.05, 0.05, 0.02, 0.005, 0.005, 0.005]) * rng.randn(6),
            np.float32,
        )
        for tw in twists
    ]
    gt = np.tile(np.eye(4), (N_FRAMES, 1, 1))
    for i, p in enumerate(poses):
        gt[i, :3, :3] = np.asarray(p.R)
        gt[i, :3, 3] = np.asarray(p.t)
    return frames, twists, gt


def _make_mapper(merge_every=1):
    # Point-to-plane + GN: on ground-dominant spinning scans, point-to-
    # point NN matching has a spurious attractor at the MAP's sensor pose
    # (local ring circles snap onto the map's concentric ring pattern —
    # measured: align started AT ground truth converged 0.53 m back toward
    # the map viewpoint). Plane matching makes ground points constrain only
    # z/pitch/roll, and façades+pillars pin x/y/yaw: err 0.03 in 4 iters on
    # the same pair. (The reference hits the same physics — its LO
    # pipelines are point-to-plane too.)
    icp = ICP(
        matchers=[
            MatcherPoint2Plane(
                distance_threshold=1.5,
                knn=8,
                layer_matches=(
                    LayerMatch(global_layer="map", local_layer="decimated"),
                ),
            )
        ],
        solvers=[
            SolverGaussNewton(gn_params=GNParams(max_iterations=3)),
        ],
    )
    params = ICPParameters(
        max_iterations=30,
        crop_capacity=1 << 14,  # < map capacity: the crop path runs
        crop_extra_margin=3.0,
    )
    filters = [
        FilterDeskew(input_pointcloud_layer="raw",
                     output_pointcloud_layer="deskewed"),
        FilterDecimateVoxels(
            input_pointcloud_layer=("deskewed",),
            output_pointcloud_layer="decimated",
            voxel_filter_resolution=0.5,
            output_capacity=4096,
        ),
    ]
    map_filters = [
        # map maintenance: one (oldest) point per voxel — collapses the
        # ghost layers overlapping scans deposit and bounds the map
        FilterDecimateVoxels(
            input_pointcloud_layer=("map",),
            output_pointcloud_layer="map",
            voxel_filter_resolution=0.5,
            output_capacity=1 << 17,
        ),
    ]
    return OdometryMapper(
        icp=icp, params=params, filters=filters,
        local_layer="decimated", map_layer="map",
        map_capacity=1 << 17, merge_every=merge_every,
        map_filters=map_filters,
    )


@pytest.fixture(scope="module")
def odometry_run():
    frames, twists, gt = _make_sequence()
    mapper = _make_mapper()
    out = mapper.run(
        frames, twists=twists, dt=DT,
        initial_pose=se3.Pose(
            jnp.asarray(gt[0, :3, :3], jnp.float32),
            jnp.asarray(gt[0, :3, 3], jnp.float32),
        ),
    )
    return {"frames": frames, "twists": twists, "gt": gt,
            "mapper": mapper, "out": out}


class TestOdometryMapping:
    def test_trajectory_gates(self, odometry_run):
        out = odometry_run["out"]
        gt = odometry_run["gt"]
        ate = ate_rmse(out["poses"], gt)
        assert ate < 0.15, ate
        assert (out["qualities"] > 0.3).all(), out["qualities"].min()
        assert out["scans_per_s"] > 0

    def test_map_covers_street(self, odometry_run):
        m = odometry_run["out"]["map"]
        n = int(m.count)
        assert n > 5_000
        xyz = np.asarray(m.xyz[:n])
        span = xyz[:, 0].max() - xyz[:, 0].min()
        assert span > 50.0  # accumulated well beyond one sweep's window

    def test_fused_map_matches_filter_pipeline_path(self, odometry_run):
        """Equality contract: the on-device fused merge == the sm2mm-style
        host FilterMerge path over the same estimated poses."""
        out = odometry_run["out"]
        ref_map = reference_pipeline_map(
            odometry_run["mapper"], odometry_run["frames"], out["poses"],
            twists=odometry_run["twists"],
        )
        n_fused = int(out["map"].count)
        n_ref = int(ref_map.count)
        assert n_fused == n_ref
        a = np.asarray(out["map"].xyz[:n_fused])
        b = np.asarray(ref_map.xyz[:n_ref])
        # identical insert order; coordinates differ only by the float32
        # pose-matrix vs ypr-reconstruction round trip
        np.testing.assert_allclose(a, b, atol=5e-3)
        i_f = np.asarray(out["map"].intensity[:n_fused])
        i_r = np.asarray(ref_map.intensity[:n_ref])
        np.testing.assert_allclose(i_f, i_r, atol=1e-6)

    def test_keyframed_merge(self, odometry_run):
        """merge_every=3 still tracks but accumulates a smaller map."""
        frames = odometry_run["frames"]
        twists = odometry_run["twists"]
        gt = odometry_run["gt"]
        mapper = _make_mapper(merge_every=3)
        out = mapper.run(
            frames, twists=twists, dt=DT,
            initial_pose=se3.Pose(
                jnp.asarray(gt[0, :3, :3], jnp.float32),
                jnp.asarray(gt[0, :3, 3], jnp.float32),
            ),
        )
        assert ate_rmse(out["poses"], gt) < 0.25
        # voxel-bounded map: fewer merged scans cannot cover MORE voxels
        assert int(out["map"].count) <= int(odometry_run["out"]["map"].count)


class TestMappingCLI:
    def test_kitti_odometry_mapping_mode(self, tmp_path, odometry_run):
        """CLI surface: --mapping drives OdometryMapper from a reference-
        schema YAML (matchers re-pointed at the rolling map layer) over
        KITTI .bin scans and saves the final map."""
        from mp2p_icp_tpu.apps.kitti_odometry import main as ko_main
        from mp2p_icp_tpu.io.kitti import save_kitti_bin
        from mp2p_icp_tpu.io.mm import load_mm_file

        frames = odometry_run["frames"][:8]
        gt = odometry_run["gt"]
        bin_dir = tmp_path / "velodyne"
        bin_dir.mkdir()
        for i, fr in enumerate(frames):
            save_kitti_bin(str(bin_dir / f"{i:06d}.bin"), fr["raw"])
        # frame-0-relative GT (the CLI loop starts at identity)
        gt_rel = np.linalg.inv(gt[0]) @ gt[: len(frames)]
        np.savetxt(str(tmp_path / "gt.txt"),
                   gt_rel[:, :3, :].reshape(len(frames), 12))
        cfg = tmp_path / "icp.yaml"
        cfg.write_text("""\
class_name: mp2p_icp::ICP
params:
  maxIterations: 30
solvers:
  - class: mp2p_icp::Solver_GaussNewton
    params: { maxIterations: 3 }
matchers:
  - class: mp2p_icp::Matcher_Point2Plane
    params:
      distanceThreshold: 1.5
      knn: 8
      pointLayerMatches:
        - { global: "decimated", local: "decimated", weight: 1.0 }
filters:
  - class_name: mp2p_icp_filters::FilterDecimateVoxels
    params:
      output_pointcloud_layer: "decimated"
      voxel_filter_resolution: 0.5
""")
        out_map = tmp_path / "final.mm.npz"
        rc = ko_main([
            "--bin-dir", str(bin_dir), "-c", str(cfg), "--mapping",
            "--map-capacity", str(1 << 16), "--gt-poses",
            str(tmp_path / "gt.txt"), "--out-map", str(out_map),
            # straight drive: the loop-closure pass runs and finds zero
            # candidates (positive-closure coverage: test_loop_closure.py)
            "--loop-closure", "--loop-min-gap", "3",
        ])
        assert rc == 0
        mm = load_mm_file(str(out_map))
        assert int(mm.layers["map"].count) > 2000


class TestBatchedStreams:
    def test_batched_streams_match_sequential(self, odometry_run):
        """B=2 independent odometry streams in ONE vmapped program per
        frame must reproduce the per-stream sequential runs exactly
        (same step function, vmapped — the fleet/multi-robot TPU
        deployment shape)."""
        from mp2p_icp_tpu.odometry import BatchedOdometryMapper

        frames = odometry_run["frames"]
        twists = odometry_run["twists"]
        gt = odometry_run["gt"]
        n = 7
        streams = [frames[0:n], frames[8:8 + n]]
        stream_twists = [twists[0:n], twists[8:8 + n]]
        p0s = [
            se3.Pose(jnp.asarray(gt[0, :3, :3], jnp.float32),
                     jnp.asarray(gt[0, :3, 3], jnp.float32)),
            se3.Pose(jnp.asarray(gt[8, :3, :3], jnp.float32),
                     jnp.asarray(gt[8, :3, 3], jnp.float32)),
        ]

        bmapper = BatchedOdometryMapper(_make_mapper())
        out_b = bmapper.run(
            streams, twists=stream_twists, initial_poses=p0s, dt=DT
        )
        assert out_b["poses"].shape == (2, n, 4, 4)

        for b in range(2):
            seq = _make_mapper().run(
                streams[b], twists=stream_twists[b],
                initial_pose=p0s[b], dt=DT,
            )
            np.testing.assert_allclose(
                out_b["poses"][b], seq["poses"], atol=5e-4,
            )
            # same map contents per stream
            nb = int(np.asarray(out_b["maps"].count)[b])
            ns = int(seq["map"].count)
            assert nb == ns
            np.testing.assert_allclose(
                np.asarray(out_b["maps"].xyz[b][:nb]),
                np.asarray(seq["map"].xyz[:ns]),
                atol=5e-3,
            )
        # both streams tracked
        for b, off in ((0, 0), (1, 8)):
            errs = np.linalg.norm(
                out_b["poses"][b, :, :3, 3] - gt[off:off + n, :3, 3], axis=1
            )
            assert errs.max() < 0.25, (b, errs.max())


class TestIncrementalHashMap:
    def test_incremental_mode_matches_sort_maintenance(self, odometry_run):
        """incremental_map_resolution (ops/voxel_hash_map.py) replaces the
        per-frame map-capacity sort with an O(n_new) hash insert. The
        FirstPoint winner per voxel (earliest merged point) is the same
        in both modes, so the trajectory and the map voxel set must
        agree with the sort-maintenance run."""
        frames = odometry_run["frames"]
        twists = odometry_run["twists"]
        gt = odometry_run["gt"]
        base = _make_mapper()
        inc = OdometryMapper(
            icp=base.icp, params=base.params, filters=base.filters,
            local_layer="decimated", map_layer="map",
            map_capacity=1 << 17,
            incremental_map_resolution=0.5,
        )
        p0 = se3.Pose(
            jnp.asarray(gt[0, :3, :3], jnp.float32),
            jnp.asarray(gt[0, :3, 3], jnp.float32),
        )
        out = inc.run(frames, twists=twists, dt=DT, initial_pose=p0)
        assert ate_rmse(out["poses"], gt) < 0.15
        assert int(out["map_state"].n_dropped) == 0

        ref = odometry_run["out"]
        # same voxel winners: compare cell sets (poses differ only at NN
        # tie-break level, so demand near-equality of the voxel sets)
        n_i = int(out["map"].count)
        n_s = int(ref["map"].count)
        ci = np.floor(np.asarray(out["map"].xyz[:n_i]) / 0.5).astype(np.int64)
        cs = np.floor(np.asarray(ref["map"].xyz[:n_s]) / 0.5).astype(np.int64)
        set_i = {tuple(c) for c in ci}
        set_s = {tuple(c) for c in cs}
        jac = len(set_i & set_s) / max(len(set_i | set_s), 1)
        assert jac > 0.98, jac
        # trajectories agree closely frame-by-frame
        dt_pos = np.linalg.norm(
            out["poses"][:, :3, 3] - ref["poses"][:, :3, 3], axis=1
        )
        assert dt_pos.max() < 0.05, dt_pos.max()

    def test_incremental_rejects_map_filters(self):
        base = _make_mapper()
        with pytest.raises(ValueError):
            OdometryMapper(
                icp=base.icp, params=base.params, filters=base.filters,
                map_filters=base.map_filters,
                incremental_map_resolution=0.5,
            )

    def test_batched_incremental_matches_sequential(self, odometry_run):
        """The vmapped fleet shape over the hash-map state."""
        from mp2p_icp_tpu.odometry import BatchedOdometryMapper

        frames = odometry_run["frames"]
        twists = odometry_run["twists"]
        gt = odometry_run["gt"]
        base = _make_mapper()

        def make_inc():
            return OdometryMapper(
                icp=base.icp, params=base.params, filters=base.filters,
                local_layer="decimated", map_layer="map",
                map_capacity=1 << 17,
                incremental_map_resolution=0.5,
            )

        n = 6
        streams = [frames[0:n], frames[8:8 + n]]
        stream_twists = [twists[0:n], twists[8:8 + n]]
        p0s = [
            se3.Pose(jnp.asarray(gt[0, :3, :3], jnp.float32),
                     jnp.asarray(gt[0, :3, 3], jnp.float32)),
            se3.Pose(jnp.asarray(gt[8, :3, :3], jnp.float32),
                     jnp.asarray(gt[8, :3, 3], jnp.float32)),
        ]
        out_b = BatchedOdometryMapper(make_inc()).run(
            streams, twists=stream_twists, initial_poses=p0s, dt=DT
        )
        for b in range(2):
            seq = make_inc().run(
                streams[b], twists=stream_twists[b],
                initial_pose=p0s[b], dt=DT,
            )
            np.testing.assert_allclose(
                out_b["poses"][b], seq["poses"], atol=5e-4
            )
            nb = int(np.asarray(out_b["maps"].count)[b])
            assert nb == int(seq["map"].count)


class TestSpatialShardedOdometry:
    def test_spatial_mapper_tracks_and_partitions(self, odometry_run):
        """The mapping loop with the rolling map sharded over a 4-device
        'space' mesh: per-shard MXU sweeps + all_gather k-merge for the
        align; voxel-OWNERSHIP-routed merges (hash(cell) % n_shards).
        Gates: tracking ATE, exact cross-shard disjointness + ownership,
        and near-identity of the voxel set vs the single-device run."""
        import jax
        from jax.sharding import Mesh

        from mp2p_icp_tpu.odometry import SpatialOdometryMapper

        frames = odometry_run["frames"][:10]
        twists = odometry_run["twists"][:10]
        gt = odometry_run["gt"]
        p0 = se3.Pose(
            jnp.asarray(gt[0, :3, :3], jnp.float32),
            jnp.asarray(gt[0, :3, 3], jnp.float32),
        )
        n_shards = 4
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
        sm = SpatialOdometryMapper(
            mapper=_make_mapper(), mesh=mesh, ownership_resolution=0.5
        )
        out = sm.run(frames, twists=twists, dt=DT, initial_pose=p0)
        assert ate_rmse(out["poses"], gt[:10]) < 0.25
        assert (out["qualities"] > 0.3).all()

        # shard maps: ownership + disjointness are EXACT by construction
        msh = out["map"]
        vox_sets = []
        for s in range(n_shards):
            ns = int(np.asarray(msh.count)[s])
            xyz = np.asarray(msh.xyz[s][:ns])
            cell = np.floor(xyz / 0.5).astype(np.int64)
            h = (
                cell[:, 0] * 73856093 ^ cell[:, 1] * 19349663
                ^ cell[:, 2] * 83492791
            ) & 0x7FFFFFFF
            assert (h % n_shards == s).all(), f"shard {s} owns a foreign voxel"
            vox_sets.append({tuple(c) for c in cell})
        for a in range(n_shards):
            for b in range(a + 1, n_shards):
                assert not (vox_sets[a] & vox_sets[b])

        # TRAJECTORY parity vs the unsharded run (VERDICT r4 Next #3):
        # the sharded matcher path merges exact per-shard k-lists and the
        # voxel-ownership merge keeps the same FirstPoint winners, so the
        # two runs must agree per-frame to centimetre level (measured
        # 2.7 mm max on this sequence), not just track the same GT
        seq = _make_mapper().run(
            frames, twists=twists, dt=DT, initial_pose=p0
        )
        dt_pos = np.linalg.norm(
            out["poses"][:, :3, 3] - seq["poses"][:, :3, 3], axis=1
        )
        assert dt_pos.max() < 0.02, dt_pos
        nseq = int(seq["map"].count)
        cell1 = np.floor(np.asarray(seq["map"].xyz[:nseq]) / 0.5).astype(
            np.int64
        )
        set1 = {tuple(c) for c in cell1}
        union = set().union(*vox_sets)
        jac = len(set1 & union) / max(len(set1 | union), 1)
        assert jac > 0.9, jac

    def test_spatial_incremental_mode(self, odometry_run):
        """The r5 flagship configuration (incremental voxel-hash map +
        stored normals, k=1 matcher) SHARDED over the 'space' mesh: the
        per-shard hash inserts route by voxel ownership, and the stored
        normals ride the spatial kNN k-merge as the payload
        (ops/nn_bruteforce point_payload). Gates: tracking ATE, no
        dropped inserts, exact ownership, voxel-set agreement with the
        unsharded incremental run."""
        import dataclasses as _dc

        import jax
        from jax.sharding import Mesh

        from mp2p_icp_tpu.odometry import (
            OdometryMapper,
            SpatialOdometryMapper,
        )

        frames = odometry_run["frames"][:10]
        twists = odometry_run["twists"][:10]
        gt = odometry_run["gt"]
        base = _make_mapper()
        icp_inc = ICP(
            matchers=[
                _dc.replace(base.icp.matchers[0], use_point_normals=True)
            ],
            solvers=base.icp.solvers,
        )

        def make_inc():
            return OdometryMapper(
                icp=icp_inc, params=base.params, filters=base.filters,
                local_layer="decimated", map_layer="map",
                map_capacity=1 << 17,
                incremental_map_resolution=0.5,
                normals_knn=8, normals_radius=1.5,
            )

        p0 = se3.Pose(
            jnp.asarray(gt[0, :3, :3], jnp.float32),
            jnp.asarray(gt[0, :3, 3], jnp.float32),
        )
        n_shards = 4
        mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
        sm = SpatialOdometryMapper(
            mapper=make_inc(), mesh=mesh, ownership_resolution=0.5
        )
        out = sm.run(frames, twists=twists, dt=DT, initial_pose=p0)
        assert ate_rmse(out["poses"], gt[:10]) < 0.25
        assert int(np.asarray(out["map_state"].n_dropped).sum()) == 0

        msh = out["map"]
        vox_sets = []
        for s in range(n_shards):
            ns = int(np.asarray(msh.count)[s])
            xyz = np.asarray(msh.xyz[s][:ns])
            cell = np.floor(xyz / 0.5).astype(np.int64)
            h = (
                cell[:, 0] * 73856093 ^ cell[:, 1] * 19349663
                ^ cell[:, 2] * 83492791
            ) & 0x7FFFFFFF
            assert (h % n_shards == s).all(), f"shard {s} foreign voxel"
            vox_sets.append({tuple(c) for c in cell})
        for a in range(n_shards):
            for b in range(a + 1, n_shards):
                assert not (vox_sets[a] & vox_sets[b])

        seq = make_inc().run(frames, twists=twists, dt=DT, initial_pose=p0)
        nseq = int(seq["map"].count)
        set1 = {
            tuple(c)
            for c in np.floor(
                np.asarray(seq["map"].xyz[:nseq]) / 0.5
            ).astype(np.int64)
        }
        union = set().union(*vox_sets)
        jac = len(set1 & union) / max(len(set1 | union), 1)
        assert jac > 0.9, jac
        # trajectory close to the unsharded incremental run (normals fit
        # candidates differ per shard, so allow a few cm)
        dt_pos = np.linalg.norm(
            out["poses"][:, :3, 3] - seq["poses"][:, :3, 3], axis=1
        )
        assert dt_pos.max() < 0.05, dt_pos
