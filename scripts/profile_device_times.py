"""TRUE device times for odometry step components.

Unroll K dependent repetitions of the op inside ONE jit (no lax loop —
fori_loop has pathological per-iteration overhead on the axon platform),
one dispatch, fetch once. Device time per unit = (t(K2) - t(K1))/(K2-K1),
which cancels dispatch + fixed overheads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mp2p_icp_tpu.core.pointcloud import PointCloud  # noqa: E402
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels  # noqa: E402
from mp2p_icp_tpu.filters.deskew import FilterDeskew  # noqa: E402
from mp2p_icp_tpu.filters.merge import FilterMerge  # noqa: E402
from mp2p_icp_tpu.ops.voxel_hash_map import (  # noqa: E402
    empty_voxel_hash_map, hash_map_insert,
)

K1, K2 = 4, 12
REPS = 8
rng = np.random.RandomState(0)
N = 1 << 16
NV = 36864
xyz = np.full((N, 3), PointCloud.PAD_VALUE, np.float32)
xyz[:NV] = rng.randn(NV, 3) * 15.0
tt = np.zeros((N,), np.float32)
tt[:NV] = rng.rand(NV) * 0.1
pc = PointCloud(xyz=jnp.asarray(xyz), count=jnp.asarray(NV, jnp.int32),
                time=jnp.asarray(tt))
tw = jnp.asarray([6.0, 0.1, 0.02, 0.01, 0.005, 0.1], jnp.float32)


def measure(name, unit_fn, *args):
    """unit_fn(c, *args) -> scalar; chained K times unrolled."""

    def make(K):
        @jax.jit
        def run(c, *a):
            for _ in range(K):
                c = unit_fn(c, *a)
            return c
        return run

    times = {}
    for K in (K1, K2):
        run = make(K)
        c = run(jnp.asarray(0.0), *args)
        _ = float(c)
        t0 = time.perf_counter()
        for _ in range(REPS):
            c = run(c, *args)
        _ = float(c)
        times[K] = (time.perf_counter() - t0) / REPS
    ms = (times[K2] - times[K1]) / (K2 - K1) * 1e3
    print(f"{name:46s} {ms:8.3f} ms/unit   (K{K1}={times[K1]*1e3:.1f}ms "
          f"K{K2}={times[K2]*1e3:.1f}ms)")


def dep_pc(c, base=None):
    base = base if base is not None else pc
    return dataclasses.replace(base, xyz=base.xyz + c * 1e-12)


dsk = FilterDeskew(input_pointcloud_layer="raw",
                   output_pointcloud_layer="deskewed")


def u_deskew(c, twa):
    vars_ = {"vx": twa[0], "vy": twa[1], "vz": twa[2],
             "wx": twa[3], "wy": twa[4], "wz": twa[5]}
    out = dsk({"raw": dep_pc(c)}, vars_)["deskewed"]
    return c + out.xyz[0, 0] * 1e-12


measure("deskew 64k", u_deskew, tw)

dec_sort = FilterDecimateVoxels(
    input_pointcloud_layer=("raw",), output_pointcloud_layer="out",
    voxel_filter_resolution=0.5, output_capacity=6144)


def u_dec_sort(c):
    out = dec_sort({"raw": dep_pc(c)})["out"]
    return c + out.xyz[0, 0] * 1e-12


measure("decimate sort 64k->6k", u_dec_sort)

dec_hash = FilterDecimateVoxels(
    input_pointcloud_layer=("raw",), output_pointcloud_layer="out",
    voxel_filter_resolution=0.5, output_capacity=6144, backend="hash")


def u_dec_hash(c):
    out = dec_hash({"raw": dep_pc(c)})["out"]
    return c + out.xyz[0, 0] * 1e-12


measure("decimate hash 64k->6k", u_dec_hash)

xyz2 = np.full((6144, 3), PointCloud.PAD_VALUE, np.float32)
xyz2[:3500] = rng.randn(3500, 3) * 30.0
pc_new = PointCloud(xyz=jnp.asarray(xyz2), count=jnp.asarray(3500, jnp.int32))
st0 = empty_voxel_hash_map(1 << 15)
xyz3 = rng.randn(13000, 3).astype(np.float32) * 30.0
st0 = jax.jit(lambda s, p: hash_map_insert(s, p, 0.5))(
    st0, PointCloud.from_numpy(xyz3, capacity=1 << 14))


def u_hash_insert(c, st_k1):
    new = dataclasses.replace(pc_new, xyz=pc_new.xyz + c * 1e-12)
    st = dataclasses.replace(
        st0._replace(table_k1=st_k1 + (c * 0).astype(jnp.int32))
    ) if False else st0._replace(table_k1=st_k1 + (c * 0).astype(jnp.int32))
    st = hash_map_insert(st, new, 0.5)
    return c + st.pc.xyz[0, 0] * 1e-12


measure("hash_map_insert 6k new -> 32k map", u_hash_insert, st0.table_k1)

merge = FilterMerge(input_pointcloud_layer="__world", target_layer="map",
                    target_capacity=1 << 15)
maint = FilterDecimateVoxels(
    input_pointcloud_layer=("map",), output_pointcloud_layer="map",
    voxel_filter_resolution=0.5, output_capacity=1 << 15)
map_xyz = np.full((1 << 15, 3), PointCloud.PAD_VALUE, np.float32)
map_xyz[:13000] = xyz3
map_pc = PointCloud(xyz=jnp.asarray(map_xyz),
                    count=jnp.asarray(13000, jnp.int32))


def u_merge_sort(c, mxyz):
    mp = dataclasses.replace(map_pc, xyz=mxyz + c * 1e-12)
    new = dataclasses.replace(pc_new, xyz=pc_new.xyz + c * 1e-12)
    layers = merge({"__world": new, "map": mp})
    layers = maint(layers)
    return c + layers["map"].xyz[0, 0] * 1e-12


measure("sort-path merge+maintenance 32k", u_merge_sort, map_pc.xyz)

T = 1 << 17
tk = jnp.zeros((T,), jnp.int32)
slot6 = jnp.asarray(rng.randint(0, T, 6144), jnp.int32)
slot64 = jnp.asarray(rng.randint(0, T, N), jnp.int32)


def u_gather(c, slot):
    g = tk[slot + (c * 0).astype(jnp.int32)]
    return c + g[0].astype(jnp.float32) * 1e-12


def u_scatter(c, slot):
    v = jnp.arange(slot.shape[0], dtype=jnp.int32) + (c * 0).astype(jnp.int32)
    out = tk.at[slot].set(v)
    return c + out[0].astype(jnp.float32) * 1e-12


measure("gather 6k from 128k", u_gather, slot6)
measure("scatter 6k into 128k", u_scatter, slot6)
measure("gather 64k from 128k", u_gather, slot64)
measure("scatter 64k into 128k", u_scatter, slot64)
