"""Scan-to-map LiDAR odometry with a rolling on-device map.

The reference's raison d'être is feeding mola_lidar_odometry: per frame,
generator -> deskew -> decimate -> scan-to-accumulated-map align -> map
update. The reference realises the map update through the sm2mm filter
pipeline (mp2p_icp_filters/src/sm2mm.cpp:159-249 runs
generators+filters per keyframe with robot-pose variables) whose insert
step is FilterMerge (mp2p_icp_filters/src/FilterMerge.cpp:96-108).

TPU-first design: the WHOLE per-frame loop is ONE jitted dispatch —
  1. local filter pipeline (FilterDeskew with the frame's twist variables,
     FilterDecimateVoxels, ...) traced inline;
  2. the fused scan-to-map ICP align (crop path, MXU NN) against the
     current rolling map;
  3. map update by the solved pose: either a FilterMerge scatter +
     FilterDecimateVoxels maintenance (sort mode), or — the r5 fast
     path — an O(n_new) insert into an incremental voxel hash map
     (`incremental_map_resolution`, ops/voxel_hash_map.py) with
     winners-only per-point normal fits feeding the plane-capable-map
     matcher (`MatcherPoint2Plane(use_point_normals=True)`) —
with the map donated back to itself (jax.jit donate) so the 10⁶-point
buffer never copies, and the pose chain staying on device. The host feeds
raw scans and fetches the trajectory at the end; there are zero
per-iteration host syncs and one dispatch per frame (`run`), or ONE
dispatch for the whole sequence (`run_offline`, lax.scan).

Equality contracts (tested in tests/test_odometry_mapping.py): the map
the sort-mode loop builds matches the host-side sm2mm filter-pipeline
path (FilterMerge with robot-pose variables) run over the same estimated
poses; the incremental mode keeps the same FirstPoint winners per voxel.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.filters import apply_filter_pipeline
from mp2p_icp_tpu.filters.merge import FilterMerge


@dataclasses.dataclass
class OdometryMapper:
    """Drives the fused step over a scan stream.

    icp/params: the ICP modules + ICPParameters (crop path recommended:
      params.crop_capacity < map_capacity).
    filters: per-frame local filter pipeline (deskew/decimate/...); its
      output must contain ``local_layer``.
    local_layer: the filtered layer registered against the map AND merged
      into it (the sm2mm pattern: the decimated deskewed cloud).
    map_layer: the global map layer name the matchers reference.
    map_capacity: fixed rolling-map buffer size (overflow points drop,
      FilterMerge semantics).
    """

    icp: object
    params: object
    filters: Sequence = ()
    local_layer: str = "decimated"
    map_layer: str = "map"
    map_capacity: int = 1 << 20
    # merge only every k-th frame into the map (keyframing); every frame
    # still aligns. 1 = merge all.
    merge_every: int = 1
    # filters applied to the MAP layer after every merge (the reference's
    # sm2mm 'final_filters' / map-maintenance pattern). A
    # FilterDecimateVoxels(FIRST_POINT) here is the standard LO map
    # maintenance: it collapses the ghost layers each overlapping scan
    # deposits at its (slightly drifted) pose — without it the newest ghost
    # layer becomes a drift attractor and the odometry feedback diverges
    # (measured: ATE 0.33 -> 0.04 on the street sequence), and it bounds
    # the map at one point per voxel.
    map_filters: Sequence = ()
    # INCREMENTAL map maintenance (ops/voxel_hash_map.py): when set, the
    # rolling map is a voxel hash map at this resolution — merge +
    # FirstPoint maintenance become an O(n_new) hash insert instead of a
    # full map-capacity sort every frame (the r4 bottleneck; BASELINE.md
    # r4 decomposition). Semantically identical to map_filters =
    # [FilterDecimateVoxels(FIRST_POINT, resolution)] (same winner per
    # voxel: the earliest-merged point); mutually exclusive with
    # map_filters.
    incremental_map_resolution: Optional[float] = None
    map_table_size: Optional[int] = None
    # Fit per-point normals for newly merged map points against the
    # ACCUMULATED map + the new scan (ops/normals.py). Multi-sweep
    # neighbourhoods are better conditioned than a single scan's (ring
    # collinearity), and the fit runs ONCE per frame instead of per ICP
    # iteration — pair with MatcherPoint2Plane(use_point_normals=True),
    # the reference's plane-capable-map contract. 0 = off.
    normals_knn: int = 0
    normals_radius: float = 1.5
    normals_eigen_threshold: float = 1e-2
    # incremental mode fits normals ONLY for the points that actually
    # entered the map this frame (~voxel-growth rate, a few hundred at
    # steady state), compacted to this static query capacity — the fit
    # leaves the per-scan cost almost entirely. Frames inserting more
    # than this many NEW voxels (the first frames of a run) leave the
    # overflow normal-less; size to the expected per-frame map growth.
    normals_query_capacity: int = 2048

    def __post_init__(self):
        self._step_cache = {}
        self._seed_jit = None
        if self.incremental_map_resolution is not None and self.map_filters:
            raise ValueError(
                "incremental_map_resolution replaces map_filters — "
                "configure one or the other"
            )

    @property
    def _incremental(self) -> bool:
        return self.incremental_map_resolution is not None

    def _map_pc(self, map_state):
        """The align-facing PointCloud view of the map state."""
        return map_state.pc if self._incremental else map_state

    # ------------------------------------------------------------------
    def _build_step_fn(self, dt: Optional[float]):
        """One fused frame program (raw traced fn — `_build_step` jits it;
        BatchedOdometryMapper vmaps it). EVERYTHING is in-trace — including
        the guess composition (motion-model exp(dt·twist_prev) when ``dt``
        is static, else the previous relative pose): on the axon platform
        each distinct EAGER op remote-compiles its own tiny program
        (seconds each), so the host loop must touch no jnp math at all."""
        matchers = tuple(self.icp.matchers)
        merge = FilterMerge(
            input_pointcloud_layer="__world",
            target_layer=self.map_layer,
            target_capacity=self.map_capacity,
        )

        def step(map_state, raw_layers, prev_pose, rel_prev, twist,
                 twist_prev, do_merge):
            """-> (new_map_state, new_pose, rel_new, quality, n_pairings).
            map_state is a PointCloud (sort-maintenance mode) or a
            VoxelHashMapState (incremental mode)."""
            map_pc = self._map_pc(map_state)
            if dt is not None:
                seed_rel = se3.exp(jnp.float32(dt) * twist_prev)
            else:
                seed_rel = rel_prev
            guess = se3.compose(prev_pose, seed_rel)
            variables = {
                "vx": twist[0], "vy": twist[1], "vz": twist[2],
                "wx": twist[3], "wy": twist[4], "wz": twist[5],
            }
            local = apply_filter_pipeline(
                tuple(self.filters), dict(raw_layers), variables
            )
            l_layers = {self.local_layer: local[self.local_layer]}
            # crop once, reuse for the align AND (below) as the normals-
            # fit candidate pool — the crop covers the scan bbox + margin,
            # so every new point's neighbourhood lives inside it
            g_crop, gidx = self.icp._crop_globals(
                self.params, matchers, {self.map_layer: map_pc},
                l_layers, guess,
            )
            res = self.icp._align_core(
                self.params, matchers, {}, g_crop, l_layers, guess, None,
                gidx_maps=gidx,
            )
            pose = res.optimal_tf
            src = local[self.local_layer]
            # world transform; normals (if FilterEstimateNormals ran)
            # rotate with the pose
            src_world = src.transformed(pose)
            if self.normals_knn and not self._incremental:
                # sort-maintenance path: fit before the merge
                from mp2p_icp_tpu.ops.normals import estimate_point_normals

                near_map = g_crop[self.map_layer]
                cand = PointCloud(
                    xyz=jnp.concatenate([near_map.xyz, src_world.xyz]),
                    count=near_map.count + src_world.count,
                )
                src_world = estimate_point_normals(
                    src_world,
                    knn=self.normals_knn,
                    max_radius=self.normals_radius,
                    plane_eigen_threshold=self.normals_eigen_threshold,
                    source=cand,
                    source_valid=jnp.concatenate(
                        [near_map.valid_mask(), src_world.valid_mask()]
                    ),
                )
            if self._incremental:
                from mp2p_icp_tpu.ops.voxel_hash_map import hash_map_insert

                merged, dest = hash_map_insert(
                    map_state, src_world, self.incremental_map_resolution,
                    with_dest=True,
                )
                if self.normals_knn:
                    # fit normals ONLY for this frame's newly inserted
                    # map points: compact winners to a small static query
                    # block, fit against the cropped map + the scan, and
                    # scatter the results into the map's normals channel.
                    # Identical map normals to a fit-everything pass
                    # (same candidates) at a fraction of the cost — the
                    # non-winners' fits were computed and thrown away.
                    from mp2p_icp_tpu.ops.normals import (
                        estimate_point_normals,
                    )

                    C = merged.pc.capacity
                    cap_n = self.normals_query_capacity
                    win = dest < C
                    rank = jnp.cumsum(win.astype(jnp.int32)) - 1
                    slot = jnp.where(win & (rank < cap_n), rank, cap_n)
                    q_xyz = (
                        jnp.full((cap_n + 1, 3), PointCloud.PAD_VALUE,
                                 jnp.float32)
                        .at[slot].set(src_world.xyz)[:cap_n]
                    )
                    d_map = (
                        jnp.full((cap_n + 1,), C, jnp.int32)
                        .at[slot].set(dest)[:cap_n]
                    )
                    n_q = jnp.minimum(
                        jnp.sum(win.astype(jnp.int32)), cap_n
                    )
                    qpc = PointCloud(xyz=q_xyz, count=n_q)
                    near_map = g_crop[self.map_layer]
                    qfit = estimate_point_normals(
                        qpc,
                        knn=self.normals_knn,
                        max_radius=self.normals_radius,
                        plane_eigen_threshold=self.normals_eigen_threshold,
                        source=PointCloud(
                            xyz=jnp.concatenate(
                                [near_map.xyz, src_world.xyz]
                            ),
                            count=near_map.count + src_world.count,
                        ),
                        source_valid=jnp.concatenate(
                            [near_map.valid_mask(),
                             src_world.valid_mask()]
                        ),
                    )
                    new_normals = (
                        jnp.concatenate(
                            [merged.pc.normals,
                             jnp.zeros((1, 3), jnp.float32)]
                        )
                        .at[d_map].set(qfit.normals)[:C]
                    )
                    merged = merged._replace(
                        pc=dataclasses.replace(
                            merged.pc, normals=new_normals
                        )
                    )
            else:
                merged_layers = merge(
                    {"__world": src_world, self.map_layer: map_pc}
                )
                merged_layers = apply_filter_pipeline(
                    tuple(self.map_filters), merged_layers, None
                )
                merged = merged_layers[self.map_layer]
            new_map = jax.tree.map(
                lambda a, b: jnp.where(do_merge, a, b), merged, map_state
            )
            rel_new = se3.compose(se3.inverse(prev_pose), pose)
            return (new_map, pose, rel_new, res.quality,
                    res.final_pairings.size())

        return step

    def _build_step(self, dt: Optional[float]):
        # donate the map buffer: the rolling 10^6-point map updates in
        # place instead of copying every frame
        return jax.jit(self._build_step_fn(dt), donate_argnums=(0,))

    def _get_step(self, dt: Optional[float]):
        key = dt
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(dt)
        return self._step_cache[key]

    # ------------------------------------------------------------------
    def seed_map(self, raw_layers, pose: Pose, twist=None) -> PointCloud:
        """Initialise the map from frame 0 (filtered, world-transformed).
        Jitted as one program (eager ops each remote-compile on axon).
        Incremental mode returns a VoxelHashMapState."""
        if self._seed_jit is None:
            merge = FilterMerge(
                input_pointcloud_layer="__world",
                target_layer=self.map_layer,
                target_capacity=self.map_capacity,
            )

            def _seed(raw_layers, pose, tw):
                variables = {
                    "vx": tw[0], "vy": tw[1], "vz": tw[2],
                    "wx": tw[3], "wy": tw[4], "wz": tw[5],
                }
                local = apply_filter_pipeline(
                    tuple(self.filters), dict(raw_layers), variables
                )
                src = local[self.local_layer]
                src_world = src.transformed(pose)
                if self.normals_knn:
                    from mp2p_icp_tpu.ops.normals import (
                        estimate_point_normals,
                    )

                    # frame 0: only the scan itself is available
                    src_world = estimate_point_normals(
                        src_world,
                        knn=self.normals_knn,
                        max_radius=self.normals_radius,
                        plane_eigen_threshold=self.normals_eigen_threshold,
                    )
                if self._incremental:
                    from mp2p_icp_tpu.ops.voxel_hash_map import (
                        empty_voxel_hash_map, hash_map_insert,
                    )

                    st = empty_voxel_hash_map(
                        self.map_capacity,
                        table_size=self.map_table_size,
                        intensity=src.intensity is not None,
                        ring=src.ring is not None,
                        time=src.time is not None,
                        normals=src.normals is not None,
                    )
                    return hash_map_insert(
                        st, src_world, self.incremental_map_resolution
                    )
                layers = merge({"__world": src_world})
                layers = apply_filter_pipeline(
                    tuple(self.map_filters), layers, None
                )
                return layers[self.map_layer]

            self._seed_jit = jax.jit(_seed)
        tw = jnp.zeros(6, jnp.float32) if twist is None else jnp.asarray(
            twist, jnp.float32
        )
        return self._seed_jit(raw_layers, pose, tw)

    # ------------------------------------------------------------------
    def _get_scan_run(self, dt: Optional[float], n_steps: int):
        """Whole-sequence program: lax.scan of the fused step — ONE
        device dispatch for the full stream. The offline-mapping shape
        (the reference's sm2mm batch processing); also removes the
        per-frame dispatch + host-loop overhead the online `run` pays."""
        key = ("scan", dt, n_steps)
        if key not in self._step_cache:
            step_fn = self._build_step_fn(dt)

            def scan_body(carry, xs):
                map_state, pose, rel = carry
                frame, tw, tw_prev, do_merge = xs
                (new_map, new_pose, rel_new, q, npair) = step_fn(
                    map_state, frame, pose, rel, tw, tw_prev, do_merge
                )
                return (
                    (new_map, new_pose, rel_new),
                    (new_pose.R, new_pose.t, q),
                )

            def run_all(map_state, pose0, frames_x, tws, tws_prev, merges):
                init = (map_state, pose0, se3.identity())
                (map_f, pose_f, _), (Rs, ts, qs) = jax.lax.scan(
                    scan_body, init, (frames_x, tws, tws_prev, merges)
                )
                return map_f, pose_f, Rs, ts, qs

            self._step_cache[key] = jax.jit(
                run_all, donate_argnums=(0,)
            )
        return self._step_cache[key]

    def run_offline(
        self,
        frames: Sequence[Dict[str, PointCloud]],
        twists: Optional[Sequence] = None,
        initial_pose: Optional[Pose] = None,
        dt: Optional[float] = None,
    ) -> Dict:
        """Same contract as `run`, but the whole sequence executes as ONE
        jitted lax.scan dispatch (frames pre-stacked on device). Identical
        math/results to `run`; use for offline mapping or benchmarking
        without per-frame host involvement."""
        use_motion_model = dt is not None and twists is not None
        n = len(frames)
        pose0 = initial_pose or se3.identity()
        tws = (
            [np.asarray(t, np.float32) for t in twists]
            if twists is not None
            else [np.zeros(6, np.float32)] * n
        )
        map_state = self.seed_map(
            frames[0], pose0, jnp.asarray(tws[0])
        )
        frames_x = _stack(frames[1:])
        tws_x = jnp.asarray(np.stack(tws[1:]))
        tws_prev_x = jnp.asarray(np.stack(tws[:-1]))
        merges = jnp.asarray(
            [
                self.merge_every <= 1 or (i % self.merge_every == 0)
                for i in range(1, n)
            ]
        )
        run_all = self._get_scan_run(
            dt if use_motion_model else None, n - 1
        )
        t0 = time.perf_counter()
        map_f, pose_f, Rs, ts, qs = run_all(
            map_state, pose0, frames_x, tws_x, tws_prev_x, merges
        )
        _ = float(pose_f.t[0])  # true sync (axon)
        elapsed = time.perf_counter() - t0
        mats = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        mats[0, :3, :3] = np.asarray(pose0.R)
        mats[0, :3, 3] = np.asarray(pose0.t)
        mats[1:, :3, :3] = np.asarray(Rs)
        mats[1:, :3, 3] = np.asarray(ts)
        return {
            "poses": mats,
            "map": self._map_pc(map_f),
            "map_state": map_f,
            "scans_per_s": (n - 1) / max(elapsed, 1e-9),
            "qualities": np.asarray(qs, np.float32),
        }

    def run(
        self,
        frames: Sequence[Dict[str, PointCloud]],
        twists: Optional[Sequence] = None,
        initial_pose: Optional[Pose] = None,
        progress_every: int = 0,
        dt: Optional[float] = None,
    ) -> Dict:
        """Full odometry over raw frames (dicts of PointCloud layers).

        twists: optional per-frame body twists fed to the deskew variables
        (a deployment would take them from the IMU / velocity estimator;
        the sequence tests derive them from consecutive GT poses like the
        reference's sm2mm twist entries).

        dt: scan period. When given together with twists, the align guess
        is the MOTION-MODEL prediction pose_{i-1}·exp(dt·twist_{i-1})
        (the IMU-prediction seeding every real LO stack uses; twists[i-1]
        covers [i-1, i]). Without it the guess is the previous ESTIMATED
        relative pose (constant-velocity on estimates) — which feeds
        estimation error back into the seed: one bad align worsens the
        next guess, and past the point-to-plane basin (~0.2 m here) the
        loop diverges. Measured on the street sequence: est-seeded ATE
        0.24 vs motion-model 0.04.

        Returns {"poses": [N,4,4], "map": PointCloud, "scans_per_s",
        "qualities": [N-1]}."""
        use_motion_model = dt is not None and twists is not None
        step = self._get_step(dt if use_motion_model else None)
        n = len(frames)
        zeros6 = jnp.zeros((6,), jnp.float32)
        # device-resident twist table: the host loop must not create new
        # device arrays per frame (each eager transfer costs a tunnel trip)
        tw_dev = (
            [jnp.asarray(t, jnp.float32) for t in twists]
            if twists is not None
            else None
        )

        def twist_of(i):
            return zeros6 if tw_dev is None else tw_dev[i]

        pose0 = initial_pose or se3.identity()
        map_pc = self.seed_map(frames[0], pose0, twist_of(0))
        abs_pose = pose0
        rel_prev = se3.identity()
        dev_poses: List[Pose] = [pose0]
        qualities = []
        true_dev = jnp.asarray(True)
        t0 = time.perf_counter()
        for i in range(1, n):
            do_merge = (
                true_dev
                if (self.merge_every <= 1 or i % self.merge_every == 0)
                else ~true_dev
            )
            map_pc, new_pose, rel_prev, q, _np_ = step(
                map_pc, frames[i], abs_pose, rel_prev, twist_of(i),
                twist_of(i - 1), do_merge,
            )
            abs_pose = new_pose
            dev_poses.append(new_pose)
            qualities.append(q)
            if progress_every and i % progress_every == 0:
                _ = float(new_pose.t[0])  # true sync through the tunnel
        # one final fetch bounds every enqueued step (axon: only a host
        # fetch truly synchronises — CLAUDE.md timing recipe)
        _ = float(abs_pose.t[0])
        elapsed = time.perf_counter() - t0

        mats = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        for i, p in enumerate(dev_poses):
            mats[i, :3, :3] = np.asarray(p.R)
            mats[i, :3, 3] = np.asarray(p.t)
        return {
            "poses": mats,
            "map": self._map_pc(map_pc),
            "map_state": map_pc,
            "scans_per_s": (n - 1) / max(elapsed, 1e-9),
            "qualities": np.asarray(
                [float(q) for q in qualities], np.float32
            ),
        }


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


@dataclasses.dataclass
class BatchedOdometryMapper:
    """B INDEPENDENT odometry streams in ONE vmapped program per frame —
    the TPU deployment shape for fleet/multi-robot mapping.

    A single small-map odometry stream is latency-bound: the padded
    static shapes do ~constant work per frame while a single-core KD-tree
    touches only the live points, so one stream on one big chip wastes
    most of the machine (measured: 14 scans/s TPU vs 37 scans/s C++ on a
    12-frame street sequence at ~3.5k decimated points). Batching B
    streams amortises exactly that fixed cost: the same fused step
    (filters -> scan-to-map align -> merge -> map maintenance) runs under
    ``jax.vmap`` with per-stream maps/poses/twists, one dispatch per
    frame index for ALL streams. Greenfield vs the reference (whose
    answer to fleets is one process per robot).
    """

    mapper: OdometryMapper

    def __post_init__(self):
        self._vstep_cache = {}

    def _get_vstep(self, dt):
        if dt not in self._vstep_cache:
            fn = self.mapper._build_step_fn(dt)
            self._vstep_cache[dt] = jax.jit(
                jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, None)),
                donate_argnums=(0,),
            )
        return self._vstep_cache[dt]

    def _get_scan_vrun(self, dt, n_steps):
        key = ("scan", dt, n_steps)
        if key not in self._vstep_cache:
            fn = self.mapper._build_step_fn(dt)
            vfn = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, None))

            def scan_body(carry, xs):
                maps, pose, rel = carry
                frame, tw, tw_prev, do_merge = xs
                (new_maps, new_pose, rel_new, q, npair) = vfn(
                    maps, frame, pose, rel, tw, tw_prev, do_merge
                )
                return (
                    (new_maps, new_pose, rel_new),
                    (new_pose.R, new_pose.t, q),
                )

            def run_all(maps, pose0, frames_x, tws, tws_prev, merges):
                from mp2p_icp_tpu.core import se3 as _se3

                B = pose0.t.shape[0]
                rel0 = jax.tree.map(
                    lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                    _se3.identity(),
                )
                (maps_f, pose_f, _), (Rs, ts, qs) = jax.lax.scan(
                    scan_body, (maps, pose0, rel0),
                    (frames_x, tws, tws_prev, merges),
                )
                return maps_f, pose_f, Rs, ts, qs

            self._vstep_cache[key] = jax.jit(run_all, donate_argnums=(0,))
        return self._vstep_cache[key]

    def run_offline(self, streams, twists=None, initial_poses=None,
                    dt: Optional[float] = None):
        """Whole-fleet offline mode: ONE jitted lax.scan dispatch runs
        every frame index of every stream (body = the vmapped fused
        step). Same contract/results as `run`."""
        m = self.mapper
        B = len(streams)
        n = len(streams[0])
        assert all(len(s) == n for s in streams)

        def tw(b, i):
            if twists is None:
                return np.zeros(6, np.float32)
            return np.asarray(twists[b][i], np.float32)

        poses0 = initial_poses or [se3.identity() for _ in range(B)]
        maps = _stack([
            m.seed_map(streams[b][0], poses0[b], jnp.asarray(tw(b, 0)))
            for b in range(B)
        ])
        pose_b = _stack(poses0)
        # [n-1, B, ...] stacked frames/twists
        frames_x = jax.tree.map(
            lambda *xs: jnp.stack(xs, axis=0),
            *[_stack([streams[b][i] for b in range(B)])
              for i in range(1, n)],
        )
        tws_x = jnp.asarray(
            np.stack([[tw(b, i) for b in range(B)] for i in range(1, n)])
        )
        tws_prev_x = jnp.asarray(
            np.stack([[tw(b, i - 1) for b in range(B)]
                      for i in range(1, n)])
        )
        merges = jnp.asarray([
            m.merge_every <= 1 or (i % m.merge_every == 0)
            for i in range(1, n)
        ])
        run_all = self._get_scan_vrun(
            dt if twists is not None else None, n - 1
        )
        t0 = time.perf_counter()
        maps_f, pose_f, Rs, ts, qs = run_all(
            maps, pose_b, frames_x, tws_x, tws_prev_x, merges
        )
        _ = float(pose_f.t[0, 0])
        elapsed = time.perf_counter() - t0
        mats = np.tile(np.eye(4, dtype=np.float64), (B, n, 1, 1))
        for b in range(B):
            mats[b, 0, :3, :3] = np.asarray(poses0[b].R)
            mats[b, 0, :3, 3] = np.asarray(poses0[b].t)
        mats[:, 1:, :3, :3] = np.asarray(Rs).transpose(1, 0, 2, 3)
        mats[:, 1:, :3, 3] = np.asarray(ts).transpose(1, 0, 2)
        return {
            "poses": mats,
            "maps": m._map_pc(maps_f),
            "map_states": maps_f,
            "scans_per_s": B * (n - 1) / max(elapsed, 1e-9),
            "qualities": np.asarray(qs, np.float32).T,
        }

    def run(self, streams, twists=None, initial_poses=None,
            dt: Optional[float] = None):
        """streams: list of B frame-sequences (equal length); twists:
        optional list of B per-frame twist sequences. Returns a dict with
        batched poses [B, N, 4, 4], maps (stacked PointCloud), scans/s
        aggregated over streams."""
        m = self.mapper
        B = len(streams)
        n = len(streams[0])
        assert all(len(s) == n for s in streams)
        vstep = self._get_vstep(dt if twists is not None else None)

        zeros6 = jnp.zeros((6,), jnp.float32)

        def tw(b, i):
            if twists is None:
                return zeros6
            return jnp.asarray(twists[b][i], jnp.float32)

        poses0 = initial_poses or [se3.identity() for _ in range(B)]
        maps = _stack([
            m.seed_map(streams[b][0], poses0[b], tw(b, 0))
            for b in range(B)
        ])
        abs_pose = _stack(poses0)
        rel_prev = _stack([se3.identity() for _ in range(B)])
        tw_dev = [
            _stack([tw(b, i) for b in range(B)]) for i in range(n)
        ]
        frames_dev = [
            _stack([streams[b][i] for b in range(B)]) for i in range(n)
        ]
        dev_poses = [abs_pose]
        qualities = []
        true_dev = jnp.asarray(True)
        t0 = time.perf_counter()
        for i in range(1, n):
            do_merge = (
                true_dev
                if (m.merge_every <= 1 or i % m.merge_every == 0)
                else ~true_dev
            )
            maps, abs_pose, rel_prev, q, _np_ = vstep(
                maps, frames_dev[i], abs_pose, rel_prev, tw_dev[i],
                tw_dev[i - 1], do_merge,
            )
            dev_poses.append(abs_pose)
            qualities.append(q)
        _ = float(abs_pose.t[0, 0])  # true sync (axon)
        elapsed = time.perf_counter() - t0

        mats = np.tile(np.eye(4, dtype=np.float64), (B, n, 1, 1))
        for i, p in enumerate(dev_poses):
            mats[:, i, :3, :3] = np.asarray(p.R)
            mats[:, i, :3, 3] = np.asarray(p.t)
        return {
            "poses": mats,
            "maps": m._map_pc(maps),
            "map_states": maps,
            "scans_per_s": B * (n - 1) / max(elapsed, 1e-9),
            "qualities": np.stack(
                [np.asarray(q) for q in qualities], axis=1
            ),
        }


@dataclasses.dataclass
class SpatialOdometryMapper:
    """Map-building odometry with the rolling map SHARDED over the mesh
    'space' axis — odometry over maps larger than one device's HBM (the
    multi-chip extension of the flagship loop; SURVEY §5.7).

    - ALIGN: each device sweeps only ITS map shard with the MXU kernel;
      per-query k-lists merge with one all_gather over ICI
      (parallel.spatial / ops.nn_bruteforce spatial_axis path).
    - MERGE: VOXEL-OWNERSHIP routing — a maintenance voxel belongs to the
      device with ``teschner_hash(cell) % n_shards == shard_index``; each
      device compacts the frame's owned points into ITS rolling buffer
      and runs its own FIRST_POINT maintenance. Ownership is a pure
      function of geometry, so no voxel ever exists on two shards, and
      the union of the shard maps equals the single-device map's voxel
      set exactly (asserted in tests/test_odometry_mapping.py).

    Greenfield vs the reference (no distributed backend there); validated
    on the virtual 8-device CPU mesh like the other sharded paths.
    """

    mapper: OdometryMapper
    mesh: object
    axis: str = "space"
    # ownership voxel size; MUST match the map-maintenance resolution so
    # within-shard FIRST_POINT dedup is also globally exact
    ownership_resolution: float = 0.5

    def __post_init__(self):
        self._step_cache = {}
        from jax.sharding import PartitionSpec as P  # noqa: F401

        self._n_shards = int(self.mesh.shape[self.axis])

    def _spatial_matchers(self):
        adj = []
        for m_ in self.mapper.icp.matchers:
            if not hasattr(m_, "spatial_axis"):
                raise NotImplementedError(
                    f"{type(m_).__name__} has no spatial_axis support"
                )
            kw = {"spatial_axis": self.axis}
            if hasattr(m_, "spatial_num_shards"):
                kw["spatial_num_shards"] = self._n_shards
            adj.append(dataclasses.replace(m_, **kw))
        return tuple(adj)

    def _build_step(self, dt):
        from jax.sharding import PartitionSpec as P

        m = self.mapper
        matchers = self._spatial_matchers()
        n_shards = self._n_shards
        axis = self.axis
        # per-shard rolling buffer: capacity / n_shards each
        shard_cap = -(-m.map_capacity // n_shards)
        merge = FilterMerge(
            input_pointcloud_layer="__world",
            target_layer=m.map_layer,
            target_capacity=shard_cap,
        )
        # per-shard map maintenance: same filters, shard-sized outputs
        map_filters = tuple(
            dataclasses.replace(f, output_capacity=shard_cap)
            if hasattr(f, "output_capacity") else f
            for f in m.map_filters
        )
        inv_res = 1.0 / self.ownership_resolution

        def body(map_sh, raw_layers, prev_pose, rel_prev, twist,
                 twist_prev, do_merge):
            me = jax.lax.axis_index(axis)
            m_local = jax.tree.map(lambda x: x[0], map_sh)
            m_local_pc = m._map_pc(m_local)
            if dt is not None:
                seed_rel = se3.exp(jnp.float32(dt) * twist_prev)
            else:
                seed_rel = rel_prev
            guess = se3.compose(prev_pose, seed_rel)
            variables = {
                "vx": twist[0], "vy": twist[1], "vz": twist[2],
                "wx": twist[3], "wy": twist[4], "wz": twist[5],
            }
            local = apply_filter_pipeline(
                tuple(m.filters), dict(raw_layers), variables
            )
            l_layers = {m.local_layer: local[m.local_layer]}
            g_local, _ = m.icp._crop_globals(
                m.params, matchers, {m.map_layer: m_local_pc}, l_layers,
                guess,
            )
            res = m.icp._align_core(
                m.params, matchers, {}, g_local, l_layers, guess, None
            )
            pose = res.optimal_tf
            src = local[m.local_layer]
            world_xyz = jnp.where(
                src.valid_mask()[:, None],
                se3.apply(pose, src.xyz),
                src.xyz,
            )
            src_world = dataclasses.replace(src, xyz=world_xyz)
            # voxel-ownership routing: keep only points whose maintenance
            # cell hashes to THIS shard
            cell = jnp.floor(world_xyz * inv_res).astype(jnp.int32)
            h = (
                cell[:, 0] * jnp.int32(73856093)
                ^ cell[:, 1] * jnp.int32(19349663)
                ^ cell[:, 2] * jnp.int32(83492791)
            ) & jnp.int32(0x7FFFFFFF)
            own = (h % n_shards) == me
            if m._incremental:
                # r5 fast path sharded: insert only the OWNED points into
                # this shard's voxel hash map (explicit validity mask —
                # no compaction needed), then fit normals for this
                # shard's winners against its crop + the full scan
                from mp2p_icp_tpu.ops.voxel_hash_map import (
                    hash_map_insert,
                )

                merged, dest = hash_map_insert(
                    m_local, src_world, m.incremental_map_resolution,
                    valid=src_world.valid_mask() & own, with_dest=True,
                )
                if m.normals_knn:
                    from mp2p_icp_tpu.ops.normals import (
                        estimate_point_normals,
                    )

                    C = merged.pc.capacity
                    cap_n = m.normals_query_capacity
                    win = dest < C
                    rank = jnp.cumsum(win.astype(jnp.int32)) - 1
                    slot = jnp.where(win & (rank < cap_n), rank, cap_n)
                    q_xyz = (
                        jnp.full((cap_n + 1, 3), PointCloud.PAD_VALUE,
                                 jnp.float32)
                        .at[slot].set(src_world.xyz)[:cap_n]
                    )
                    d_map = (
                        jnp.full((cap_n + 1,), C, jnp.int32)
                        .at[slot].set(dest)[:cap_n]
                    )
                    n_q = jnp.minimum(
                        jnp.sum(win.astype(jnp.int32)), cap_n
                    )
                    near_map = g_local[m.map_layer]
                    qfit = estimate_point_normals(
                        PointCloud(xyz=q_xyz, count=n_q),
                        knn=m.normals_knn,
                        max_radius=m.normals_radius,
                        plane_eigen_threshold=m.normals_eigen_threshold,
                        source=PointCloud(
                            xyz=jnp.concatenate(
                                [near_map.xyz, src_world.xyz]
                            ),
                            count=near_map.count + src_world.count,
                        ),
                        source_valid=jnp.concatenate(
                            [near_map.valid_mask(),
                             src_world.valid_mask()]
                        ),
                    )
                    new_normals = (
                        jnp.concatenate(
                            [merged.pc.normals,
                             jnp.zeros((1, 3), jnp.float32)]
                        )
                        .at[d_map].set(qfit.normals)[:C]
                    )
                    merged = merged._replace(
                        pc=dataclasses.replace(
                            merged.pc, normals=new_normals
                        )
                    )
            else:
                from mp2p_icp_tpu.filters.common import compact

                src_owned = compact(src_world, own)
                merged_layers = merge(
                    {"__world": src_owned, m.map_layer: m_local}
                )
                merged_layers = apply_filter_pipeline(
                    map_filters, merged_layers, None
                )
                merged = merged_layers[m.map_layer]
            new_map = jax.tree.map(
                lambda a, b: jnp.where(do_merge, a, b), merged, m_local
            )
            new_map = jax.tree.map(lambda x: x[None], new_map)
            rel_new = se3.compose(se3.inverse(prev_pose), pose)
            return (new_map, pose, rel_new, res.quality,
                    res.final_pairings.size())

        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(), P(), P(), P(), P(), P()),
                out_specs=(P(self.axis), P(), P(), P(), P()),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

    def _get_step(self, dt):
        if dt not in self._step_cache:
            self._step_cache[dt] = self._build_step(dt)
        return self._step_cache[dt]

    def seed_map(self, raw_layers, pose, twist=None):
        """Sharded frame-0 seed: build the single-device seed, then route
        each point to its owning shard host-side. Incremental mode
        returns a stacked [n_shards, ...] VoxelHashMapState."""
        m = self.mapper
        single_state = m.seed_map(raw_layers, pose, twist)
        single = m._map_pc(single_state)
        n = self._n_shards
        shard_cap = -(-m.map_capacity // n)
        xyz = np.asarray(single.xyz)
        valid = np.asarray(single.valid_mask())
        cell = np.floor(xyz * (1.0 / self.ownership_resolution)).astype(
            np.int64
        )
        h = (
            cell[:, 0] * 73856093 ^ cell[:, 1] * 19349663
            ^ cell[:, 2] * 83492791
        ) & 0x7FFFFFFF
        owner = (h % n).astype(np.int32)

        if m._incremental:
            # per-shard hash states built by inserting each shard's owned
            # points (host routing; one jitted insert per shard)
            from mp2p_icp_tpu.ops.voxel_hash_map import (
                empty_voxel_hash_map, hash_map_insert,
            )

            states = []
            for s in range(n):
                sel = valid & (owner == s)
                idx = np.flatnonzero(sel)[:shard_cap]
                chan_kw = {}
                for name in ("intensity", "ring", "time"):
                    ch = getattr(single, name)
                    if ch is not None:
                        chan_kw[name] = np.asarray(ch)[idx]
                pc = PointCloud.from_numpy(
                    xyz[idx], capacity=shard_cap, **chan_kw
                )
                if single.normals is not None:
                    nr = np.zeros((shard_cap, 3), np.float32)
                    nr[: idx.shape[0]] = np.asarray(single.normals)[idx]
                    pc = dataclasses.replace(pc, normals=jnp.asarray(nr))
                st = empty_voxel_hash_map(
                    shard_cap,
                    intensity=single.intensity is not None,
                    ring=single.ring is not None,
                    time=single.time is not None,
                    normals=single.normals is not None,
                )
                states.append(hash_map_insert(
                    st, pc, m.incremental_map_resolution
                ))
            return _stack(states)

        out_xyz = np.full((n, shard_cap, 3), PointCloud.PAD_VALUE,
                          np.float32)
        counts = np.zeros((n,), np.int32)
        chans = {}
        for name in ("intensity", "ring", "time"):
            ch = getattr(single, name)
            if ch is not None:
                chans[name] = (np.asarray(ch),
                               np.zeros((n, shard_cap), np.float32))
        for s in range(n):
            sel = valid & (owner == s)
            k = min(int(sel.sum()), shard_cap)
            idx = np.flatnonzero(sel)[:k]
            out_xyz[s, :k] = xyz[idx]
            counts[s] = k
            for name, (src_ch, dst) in chans.items():
                dst[s, :k] = src_ch[idx]
        return PointCloud(
            xyz=jnp.asarray(out_xyz),
            count=jnp.asarray(counts),
            **{k: jnp.asarray(v[1]) for k, v in chans.items()},
        )

    def run(self, frames, twists=None, initial_pose=None, dt=None):
        """Same contract as OdometryMapper.run; 'map' in the result is the
        SHARDED PointCloud ([n_shards, shard_cap, ...])."""
        m = self.mapper
        step = self._get_step(dt if twists is not None else None)
        n = len(frames)
        zeros6 = jnp.zeros((6,), jnp.float32)

        def twist_of(i):
            return (
                zeros6 if twists is None
                else jnp.asarray(twists[i], jnp.float32)
            )

        pose0 = initial_pose or se3.identity()
        map_sh = self.seed_map(frames[0], pose0, twist_of(0))
        abs_pose = pose0
        rel_prev = se3.identity()
        dev_poses = [pose0]
        qualities = []
        true_dev = jnp.asarray(True)
        t0 = time.perf_counter()
        for i in range(1, n):
            do_merge = (
                true_dev
                if (m.merge_every <= 1 or i % m.merge_every == 0)
                else ~true_dev
            )
            map_sh, abs_pose, rel_prev, q, _np_ = step(
                map_sh, frames[i], abs_pose, rel_prev, twist_of(i),
                twist_of(i - 1), do_merge,
            )
            dev_poses.append(abs_pose)
            qualities.append(q)
        _ = float(abs_pose.t[0])
        elapsed = time.perf_counter() - t0
        mats = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        for i, p in enumerate(dev_poses):
            mats[i, :3, :3] = np.asarray(p.R)
            mats[i, :3, 3] = np.asarray(p.t)
        return {
            "poses": mats,
            "map": m._map_pc(map_sh),
            "map_state": map_sh,
            "scans_per_s": (n - 1) / max(elapsed, 1e-9),
            "qualities": np.asarray(
                [float(q) for q in qualities], np.float32
            ),
        }


def reference_pipeline_map(
    mapper: OdometryMapper,
    frames: Sequence[Dict[str, PointCloud]],
    poses: np.ndarray,
    twists: Optional[Sequence] = None,
) -> PointCloud:
    """The sm2mm-style HOST path: rebuild the map by running the same
    filter pipeline per frame and FilterMerge with robot-pose variables
    (FilterMerge.cpp:96-108 input_layer_in_local_coordinates=true path) —
    the equality oracle for OdometryMapper's fused on-device merge."""
    merge = FilterMerge(
        input_pointcloud_layer=mapper.local_layer,
        target_layer=mapper.map_layer,
        target_capacity=mapper.map_capacity,
        use_robot_pose=True,
    )
    layers_acc: Dict[str, PointCloud] = {}
    for i, frame in enumerate(frames):
        R = poses[i, :3, :3]
        t = poses[i, :3, 3]
        ypr = _rot_to_ypr(R)
        variables = {
            "robot_x": float(t[0]), "robot_y": float(t[1]),
            "robot_z": float(t[2]),
            "robot_yaw": ypr[0], "robot_pitch": ypr[1], "robot_roll": ypr[2],
        }
        if twists is not None:
            for k, v in zip(("vx", "vy", "vz", "wx", "wy", "wz"), twists[i]):
                variables[k] = float(v)
        local = apply_filter_pipeline(
            tuple(mapper.filters), dict(frame), variables
        )
        layers_acc[mapper.local_layer] = local[mapper.local_layer]
        layers_acc = merge(layers_acc, variables)
        layers_acc = apply_filter_pipeline(
            tuple(mapper.map_filters), layers_acc, None
        )
    return layers_acc[mapper.map_layer]


def _rot_to_ypr(R: np.ndarray):
    """ZYX yaw/pitch/roll from a rotation matrix (host helper)."""
    pitch = -np.arcsin(np.clip(R[2, 0], -1.0, 1.0))
    if abs(R[2, 0]) < 0.99999:
        yaw = np.arctan2(R[1, 0], R[0, 0])
        roll = np.arctan2(R[2, 1], R[2, 2])
    else:  # gimbal lock
        yaw = np.arctan2(-R[0, 1], R[1, 1])
        roll = 0.0
    return float(yaw), float(pitch), float(roll)
