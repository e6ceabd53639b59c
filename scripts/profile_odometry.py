"""Decompose the odometry per-frame cost on the real TPU.

Builds the SAME workload as bench.py's odometry section and times these
jitted programs separately (enqueue-N, fetch-one recipe — CLAUDE.md):
  A. local filter pipeline only (deskew + decimate, 64k sort)
  B. crop_globals only (map-capacity argsort)
  C. align core only (on pre-cropped inputs)
  D. merge + map maintenance only (map-capacity sort)
  E. the full fused step (reference total)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mp2p_icp_tpu.icp import ICP, ICPParameters  # noqa: E402
from mp2p_icp_tpu.core import se3  # noqa: E402
from mp2p_icp_tpu.eval.lidar_sim import (  # noqa: E402
    make_street_scene, render_spinning_scan, scan_to_pointcloud,
)
from mp2p_icp_tpu.filters import apply_filter_pipeline  # noqa: E402
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels  # noqa: E402
from mp2p_icp_tpu.filters.deskew import FilterDeskew  # noqa: E402
from mp2p_icp_tpu.filters.merge import FilterMerge  # noqa: E402
from mp2p_icp_tpu.matchers.base import LayerMatch  # noqa: E402
from mp2p_icp_tpu.matchers.point2plane import MatcherPoint2Plane  # noqa: E402
from mp2p_icp_tpu.odometry import OdometryMapper  # noqa: E402
from mp2p_icp_tpu.solvers.gauss_newton import GNParams  # noqa: E402
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton  # noqa: E402

n_frames = 8
dt_scan = 0.1
rng_o = np.random.RandomState(7)
scene = make_street_scene(rng_o, length=260.0, n_pillars=60)
poses, otwists, oframes = [], [], []
for i in range(n_frames):
    x = 12.0 + 10.0 * dt_scan * i
    poses.append(se3.from_xyz_ypr(
        x, 0.5 * np.sin(0.15 * i), 1.7, 0.05 * np.sin(0.2 * i), 0.0, 0.0))
for i in range(n_frames):
    j = min(i + 1, n_frames - 1)
    rel_p = se3.compose(se3.inverse(poses[i]), poses[j])
    tw = (np.asarray(se3.log(rel_p), np.float64) / dt_scan
          if i < n_frames - 1 else otwists[-1])
    otwists.append(np.asarray(tw, np.float32))
    scan = render_spinning_scan(scene, poses[i], otwists[i], rng_o,
                                n_rings=48, n_azimuth=768)
    oframes.append({"raw": scan_to_pointcloud(scan, capacity=1 << 16)})

icp_o = ICP(
    matchers=[MatcherPoint2Plane(
        distance_threshold=1.5, knn=6,
        layer_matches=(LayerMatch(global_layer="map", local_layer="decimated"),),
    )],
    solvers=[SolverGaussNewton(gn_params=GNParams(max_iterations=3))],
)
params = ICPParameters(max_iterations=30, crop_capacity=1 << 14,
                       crop_extra_margin=3.0)
filters = [
    FilterDeskew(input_pointcloud_layer="raw",
                 output_pointcloud_layer="deskewed"),
    FilterDecimateVoxels(
        input_pointcloud_layer=("deskewed",),
        output_pointcloud_layer="decimated",
        voxel_filter_resolution=0.5, output_capacity=6144),
]
map_filters = [FilterDecimateVoxels(
    input_pointcloud_layer=("map",), output_pointcloud_layer="map",
    voxel_filter_resolution=0.5, output_capacity=1 << 15)]
mapper = OdometryMapper(
    icp=icp_o, params=params, filters=filters, map_filters=map_filters,
    local_layer="decimated", map_layer="map", map_capacity=1 << 15)

p0 = se3.Pose(jnp.asarray(np.asarray(poses[0].R), jnp.float32),
              jnp.asarray(np.asarray(poses[0].t), jnp.float32))

# run a few frames to get a realistic map + pose state
r = mapper.run(oframes, twists=otwists, dt=dt_scan, initial_pose=p0)
map_pc = r["map"]
pose_prev = se3.Pose(jnp.asarray(r["poses"][-2, :3, :3], jnp.float32),
                     jnp.asarray(r["poses"][-2, :3, 3], jnp.float32))
frame = oframes[-1]
tw = jnp.asarray(otwists[-1], jnp.float32)
tw_prev = jnp.asarray(otwists[-2], jnp.float32)

matchers = tuple(icp_o.matchers)
merge = FilterMerge(input_pointcloud_layer="__world", target_layer="map",
                    target_capacity=mapper.map_capacity)


def mk_vars(tw):
    return {"vx": tw[0], "vy": tw[1], "vz": tw[2],
            "wx": tw[3], "wy": tw[4], "wz": tw[5]}


@jax.jit
def prog_filters(raw_layers, tw):
    local = apply_filter_pipeline(tuple(filters), dict(raw_layers),
                                  mk_vars(tw))
    return local["decimated"]


@jax.jit
def prog_crop(map_pc, local_pc, prev_pose, tw_prev):
    guess = se3.compose(prev_pose, se3.exp(jnp.float32(dt_scan) * tw_prev))
    g, _ = icp_o._crop_globals(params, matchers, {"map": map_pc},
                               {"decimated": local_pc}, guess)
    return g["map"]


@jax.jit
def prog_align(cropped_map, local_pc, prev_pose, tw_prev):
    guess = se3.compose(prev_pose, se3.exp(jnp.float32(dt_scan) * tw_prev))
    res = icp_o._align_core(params, matchers, {}, {"map": cropped_map},
                            {"decimated": local_pc}, guess, None)
    return res.optimal_tf, res.n_iterations


@jax.jit
def prog_merge(map_pc, local_pc, pose):
    world_xyz = jnp.where(local_pc.valid_mask()[:, None],
                          se3.apply(pose, local_pc.xyz), local_pc.xyz)
    src_world = dataclasses.replace(local_pc, xyz=world_xyz)
    layers = merge({"__world": src_world, "map": map_pc})
    layers = apply_filter_pipeline(tuple(map_filters), layers, None)
    return layers["map"]


step = mapper._get_step(dt_scan)


def timeit(name, fn, *args, n=30):
    out = fn(*args)  # warm
    leaves = jax.tree.leaves(out)
    _ = float(jnp.ravel(leaves[0])[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    _ = float(jnp.ravel(leaves[0])[0])
    dtms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:30s} {dtms:8.3f} ms")
    return out


print("== odometry step decomposition (per call, ms) ==")
local_pc = timeit("A filters (deskew+decimate)", prog_filters, frame, tw)
cropped = timeit("B crop_globals", prog_crop, map_pc, local_pc, pose_prev,
                 tw_prev)
pose_n, niter = timeit("C align core", prog_align, cropped, local_pc,
                       pose_prev, tw_prev)
print(f"  align iterations: {int(niter)}")
_ = timeit("D merge+maintenance", prog_merge, map_pc, local_pc, pose_n)
rel_prev = se3.identity()
true_dev = jnp.asarray(True)


def full(frame, map_pc):
    return step(map_pc, frame, pose_prev, rel_prev, tw, tw_prev, true_dev)


# full step donates the map; re-feed the returned map
out = full(frame, map_pc)
m2 = out[0]
_ = float(out[1].t[0])
t0 = time.perf_counter()
N = 30
for _i in range(N):
    out = full(frame, m2)
    m2 = out[0]
_ = float(out[1].t[0])
print(f"{'E full fused step':30s} {(time.perf_counter() - t0) / N * 1e3:8.3f} ms")
