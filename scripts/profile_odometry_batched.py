"""Decompose the VMAPPED (B=4) odometry step cost on the real TPU.

Times jit(vmap(...)) of the same sub-programs as profile_odometry.py to
find where the 6x-per-frame-index blowup (44 vs 66 scans/s aggregate,
BENCH_r04) comes from.
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
from mp2p_icp_tpu.odometry import OdometryMapper, _stack  # noqa: E402
from mp2p_icp_tpu.solvers.gauss_newton import GNParams  # noqa: E402
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton  # noqa: E402

B = 4
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
        distance_threshold=1.5, use_point_normals=True,
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
mapper = OdometryMapper(
    icp=icp_o, params=params, filters=filters,
    incremental_map_resolution=0.5, normals_knn=8, normals_radius=1.5,
    local_layer="decimated", map_layer="map", map_capacity=1 << 15)

p0 = se3.Pose(jnp.asarray(np.asarray(poses[0].R), jnp.float32),
              jnp.asarray(np.asarray(poses[0].t), jnp.float32))
r = mapper.run(oframes, twists=otwists, dt=dt_scan, initial_pose=p0)
map1 = r["map_state"]
pose1 = se3.Pose(jnp.asarray(r["poses"][-2, :3, :3], jnp.float32),
                 jnp.asarray(r["poses"][-2, :3, 3], jnp.float32))
frame1 = oframes[-1]
tw1 = jnp.asarray(otwists[-1], jnp.float32)
twp1 = jnp.asarray(otwists[-2], jnp.float32)

map_b = _stack([map1] * B)
pose_b = _stack([pose1] * B)
frame_b = _stack([frame1] * B)
tw_b = _stack([tw1] * B)
twp_b = _stack([twp1] * B)

matchers = tuple(icp_o.matchers)
merge = FilterMerge(input_pointcloud_layer="__world", target_layer="map",
                    target_capacity=mapper.map_capacity)


def mk_vars(tw):
    return {"vx": tw[0], "vy": tw[1], "vz": tw[2],
            "wx": tw[3], "wy": tw[4], "wz": tw[5]}


def f_filters(raw_layers, tw):
    local = apply_filter_pipeline(tuple(filters), dict(raw_layers),
                                  mk_vars(tw))
    return local["decimated"]


def f_crop(map_state, local_pc, prev_pose, tw_prev):
    guess = se3.compose(prev_pose, se3.exp(jnp.float32(dt_scan) * tw_prev))
    g, _ = icp_o._crop_globals(params, matchers, {"map": map_state.pc},
                               {"decimated": local_pc}, guess)
    return g["map"]


def f_align(cropped_map, local_pc, prev_pose, tw_prev):
    guess = se3.compose(prev_pose, se3.exp(jnp.float32(dt_scan) * tw_prev))
    res = icp_o._align_core(params, matchers, {}, {"map": cropped_map},
                            {"decimated": local_pc}, guess, None)
    return res.optimal_tf, res.n_iterations


from mp2p_icp_tpu.ops.voxel_hash_map import hash_map_insert
from mp2p_icp_tpu.ops.normals import estimate_point_normals
from mp2p_icp_tpu.core.pointcloud import PointCloud


def f_normals(map_state, local_pc, pose):
    src_world = local_pc.transformed(pose)
    map_pc = map_state.pc
    cand = PointCloud(
        xyz=jnp.concatenate([map_pc.xyz, src_world.xyz]),
        count=map_pc.count + src_world.count,
    )
    return estimate_point_normals(
        src_world, knn=8, max_radius=1.5, source=cand,
        source_valid=jnp.concatenate(
            [map_pc.valid_mask(), src_world.valid_mask()]
        ),
    ).normals


def f_merge(map_state, local_pc, pose):
    world_xyz = jnp.where(local_pc.valid_mask()[:, None],
                          se3.apply(pose, local_pc.xyz), local_pc.xyz)
    src_world = dataclasses.replace(local_pc, xyz=world_xyz)
    return hash_map_insert(map_state, src_world, 0.5).pc


def f_deskew_only(raw_layers, tw):
    local = apply_filter_pipeline(tuple(filters[:1]), dict(raw_layers),
                                  mk_vars(tw))
    return local["deskewed"]


def f_decimate_only(deskewed_pc):
    return filters[1]({"deskewed": deskewed_pc})["decimated"]


vp_deskew = jax.jit(jax.vmap(f_deskew_only))
vp_decimate = jax.jit(jax.vmap(f_decimate_only))
vp_filters = jax.jit(jax.vmap(f_filters))
vp_crop = jax.jit(jax.vmap(f_crop))
vp_align = jax.jit(jax.vmap(f_align))
vp_merge = jax.jit(jax.vmap(f_merge))
vp_normals = jax.jit(jax.vmap(f_normals))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dtms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s} {dtms:8.3f} ms")
    return out


print(f"== vmapped (B={B}) odometry step decomposition (per call, ms) ==")
dsk_b = timeit("A1 vmap deskew", vp_deskew, frame_b, tw_b)
_ = timeit("A2 vmap decimate", vp_decimate, dsk_b)
local_b = timeit("A vmap filters", vp_filters, frame_b, tw_b)
crop_b = timeit("B vmap crop_globals", vp_crop, map_b, local_b, pose_b, twp_b)
pose_nb, nit = timeit("C vmap align core", vp_align, crop_b, local_b,
                      pose_b, twp_b)
print(f"  align iterations: {np.asarray(nit)}")
_ = timeit("D vmap merge+maintenance", vp_merge, map_b, local_b, pose_nb)
_ = timeit("N vmap normals fit", vp_normals, map_b, local_b, pose_nb)

from mp2p_icp_tpu.odometry import BatchedOdometryMapper  # noqa: E402
bm = BatchedOdometryMapper(mapper)
vstep = bm._get_vstep(dt_scan)
rel_b = _stack([se3.identity()] * B)
true_dev = jnp.asarray(True)
out = vstep(map_b, frame_b, pose_b, rel_b, tw_b, twp_b, true_dev)
m2 = out[0]
_ = float(out[1].t[0, 0])
t0 = time.perf_counter()
N = 20
for _i in range(N):
    out = vstep(m2, frame_b, pose_b, rel_b, tw_b, twp_b, true_dev)
    m2 = out[0]
_ = float(out[1].t[0, 0])
print(f"{'E vmap full fused step':34s} "
      f"{(time.perf_counter() - t0) / N * 1e3:8.3f} ms")
