"""Stage profile of the CURRENT odometry step, sequential vs vmapped B=8.

Stages mirror OdometryMapper._build_step_fn (r5: crop-reuse + winners-only
normals + incremental hash map): filters, crop, align-core, insert+normals.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mp2p_icp_tpu.icp import ICP, ICPParameters  # noqa: E402
from mp2p_icp_tpu.core import se3  # noqa: E402
from mp2p_icp_tpu.core.pointcloud import PointCloud  # noqa: E402
from mp2p_icp_tpu.eval.lidar_sim import (  # noqa: E402
    make_street_scene, render_spinning_scan, scan_to_pointcloud,
)
from mp2p_icp_tpu.filters import apply_filter_pipeline  # noqa: E402
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels  # noqa: E402
from mp2p_icp_tpu.filters.deskew import FilterDeskew  # noqa: E402
from mp2p_icp_tpu.matchers.base import LayerMatch  # noqa: E402
from mp2p_icp_tpu.matchers.point2plane import MatcherPoint2Plane  # noqa: E402
from mp2p_icp_tpu.odometry import OdometryMapper, _stack  # noqa: E402
from mp2p_icp_tpu.ops.normals import estimate_point_normals  # noqa: E402
from mp2p_icp_tpu.ops.voxel_hash_map import hash_map_insert  # noqa: E402
from mp2p_icp_tpu.solvers.gauss_newton import GNParams  # noqa: E402
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton  # noqa: E402

B = int(os.environ.get("PB", "8"))
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
        layer_matches=(LayerMatch(global_layer="map",
                                  local_layer="decimated"),),
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
    normals_query_capacity=2048,
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

matchers = tuple(icp_o.matchers)


def mk_vars(tw):
    return {"vx": tw[0], "vy": tw[1], "vz": tw[2],
            "wx": tw[3], "wy": tw[4], "wz": tw[5]}


def f_filters(raw_layers, tw):
    return apply_filter_pipeline(tuple(filters), dict(raw_layers),
                                 mk_vars(tw))["decimated"]


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


def f_insert_normals(map_state, cropped_map, local_pc, pose):
    src_world = local_pc.transformed(pose)
    merged, dest = hash_map_insert(map_state, src_world, 0.5,
                                   with_dest=True)
    C = merged.pc.capacity
    cap_n = 2048
    win = dest < C
    rank = jnp.cumsum(win.astype(jnp.int32)) - 1
    slot = jnp.where(win & (rank < cap_n), rank, cap_n)
    q_xyz = (jnp.full((cap_n + 1, 3), PointCloud.PAD_VALUE, jnp.float32)
             .at[slot].set(src_world.xyz)[:cap_n])
    d_map = (jnp.full((cap_n + 1,), C, jnp.int32)
             .at[slot].set(dest)[:cap_n])
    n_q = jnp.minimum(jnp.sum(win.astype(jnp.int32)), cap_n)
    qpc = PointCloud(xyz=q_xyz, count=n_q)
    qfit = estimate_point_normals(
        qpc, knn=8, max_radius=1.5,
        source=PointCloud(
            xyz=jnp.concatenate([cropped_map.xyz, src_world.xyz]),
            count=cropped_map.count + src_world.count),
        source_valid=jnp.concatenate(
            [cropped_map.valid_mask(), src_world.valid_mask()]),
    )
    new_normals = (jnp.concatenate(
        [merged.pc.normals, jnp.zeros((1, 3), jnp.float32)])
        .at[d_map].set(qfit.normals)[:C])
    return merged._replace(
        pc=dataclasses.replace(merged.pc, normals=new_normals))


def timeit(name, fn, *args, n=25):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    print(f"{name:36s} {(time.perf_counter() - t0) / n * 1e3:8.3f} ms")
    return out


print(f"== sequential stage times ==")
j_filters = jax.jit(f_filters)
j_crop = jax.jit(f_crop)
j_align = jax.jit(f_align)
j_ins = jax.jit(f_insert_normals)
local1 = timeit("filters", j_filters, frame1, tw1)
crop1 = timeit("crop", j_crop, map1, local1, pose1, twp1)
pose_n, nit = timeit("align", j_align, crop1, local1, pose1, twp1)
print(f"  iters: {int(nit)}")
_ = timeit("insert+normals", j_ins, map1, crop1, local1, pose_n)

print(f"== vmapped B={B} stage times ==")
map_b = _stack([map1] * B)
pose_b = _stack([pose1] * B)
frame_b = _stack([frame1] * B)
tw_b = _stack([tw1] * B)
twp_b = _stack([twp1] * B)
v_filters = jax.jit(jax.vmap(f_filters))
v_crop = jax.jit(jax.vmap(f_crop))
v_align = jax.jit(jax.vmap(f_align))
v_ins = jax.jit(jax.vmap(f_insert_normals))
local_b = timeit("vmap filters", v_filters, frame_b, tw_b)
crop_b = timeit("vmap crop", v_crop, map_b, local_b, pose_b, twp_b)
pose_nb, nitb = timeit("vmap align", v_align, crop_b, local_b, pose_b,
                       twp_b)
print(f"  iters: {np.asarray(nitb)}")
_ = timeit("vmap insert+normals", v_ins, map_b, crop_b, local_b, pose_nb)
