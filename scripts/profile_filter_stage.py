"""Decompose the odometry filter stage (deskew + decimate) on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mp2p_icp_tpu.core.pointcloud import PointCloud  # noqa: E402
from mp2p_icp_tpu.filters.deskew import FilterDeskew  # noqa: E402
from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels  # noqa: E402
from mp2p_icp_tpu.ops.voxel_unique import voxel_segments  # noqa: E402

rng = np.random.RandomState(0)
N = 1 << 16
NV = 36864
xyz = np.full((N, 3), PointCloud.PAD_VALUE, np.float32)
xyz[:NV] = rng.randn(NV, 3) * 15.0
t = np.zeros((N,), np.float32)
t[:NV] = rng.rand(NV) * 0.1
pc = PointCloud(xyz=jnp.asarray(xyz), count=jnp.asarray(NV, jnp.int32),
                time=jnp.asarray(t))
tw = jnp.asarray([6.0, 0.1, 0.02, 0.01, 0.005, 0.1], jnp.float32)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1e3:8.3f} ms")
    return out


dsk = FilterDeskew(input_pointcloud_layer="raw",
                   output_pointcloud_layer="deskewed")


@jax.jit
def f_deskew(pc, tw):
    vars_ = {"vx": tw[0], "vy": tw[1], "vz": tw[2],
             "wx": tw[3], "wy": tw[4], "wz": tw[5]}
    return dsk({"raw": pc}, vars_)["deskewed"]


dec_sort = FilterDecimateVoxels(
    input_pointcloud_layer=("raw",), output_pointcloud_layer="out",
    voxel_filter_resolution=0.5, output_capacity=6144)


@jax.jit
def f_dec(pc):
    return dec_sort({"raw": pc})["out"]


@jax.jit
def f_segments(pc):
    s = voxel_segments(pc.xyz, pc.valid_mask(), 0.5)
    return s.order


@jax.jit
def f_sort_only(pc):
    k1 = (jnp.floor(pc.xyz[:, 0] / 0.5).astype(jnp.int32) * 32768
          + jnp.floor(pc.xyz[:, 1] / 0.5).astype(jnp.int32))
    k2 = jnp.floor(pc.xyz[:, 2] / 0.5).astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    a, b, c = jax.lax.sort((k1, k2, idx), num_keys=2)
    return c


@jax.jit
def f_sort_single_key(pc):
    k = (jnp.floor(pc.xyz[:, 0] / 0.5).astype(jnp.int32) * 32768
         + jnp.floor(pc.xyz[:, 1] / 0.5).astype(jnp.int32))
    idx = jnp.arange(N, dtype=jnp.int32)
    a, c = jax.lax.sort((k, idx), num_keys=1)
    return c


@jax.jit
def f_argsort(pc):
    k = (jnp.floor(pc.xyz[:, 0] / 0.5).astype(jnp.int32) * 32768
         + jnp.floor(pc.xyz[:, 1] / 0.5).astype(jnp.int32))
    return jnp.argsort(k)


timeit("deskew 64k", f_deskew, pc, tw)
timeit("decimate(sort) 64k full", f_dec, pc)
timeit("voxel_segments 64k", f_segments, pc)
timeit("lax.sort 2key+idx 64k", f_sort_only, pc)
timeit("lax.sort 1key+idx 64k", f_sort_single_key, pc)
timeit("argsort 64k", f_argsort, pc)

# smaller capacity variant
N2 = 36864
pc2 = PointCloud(xyz=jnp.asarray(xyz[:N2]), count=jnp.asarray(NV, jnp.int32),
                 time=jnp.asarray(t[:N2]))


@jax.jit
def f_sort_only2(pc):
    k1 = (jnp.floor(pc.xyz[:, 0] / 0.5).astype(jnp.int32) * 32768
          + jnp.floor(pc.xyz[:, 1] / 0.5).astype(jnp.int32))
    k2 = jnp.floor(pc.xyz[:, 2] / 0.5).astype(jnp.int32)
    idx = jnp.arange(N2, dtype=jnp.int32)
    a, b, c = jax.lax.sort((k1, k2, idx), num_keys=2)
    return c


timeit("lax.sort 2key+idx 36864", f_sort_only2, pc2)

# vmapped sort at B=4
@jax.jit
def f_sort_b(pcs):
    def one(pc):
        k1 = (jnp.floor(pc.xyz[:, 0] / 0.5).astype(jnp.int32) * 32768
              + jnp.floor(pc.xyz[:, 1] / 0.5).astype(jnp.int32))
        k2 = jnp.floor(pc.xyz[:, 2] / 0.5).astype(jnp.int32)
        idx = jnp.arange(N, dtype=jnp.int32)
        a, b, c = jax.lax.sort((k1, k2, idx), num_keys=2)
        return c
    return jax.vmap(one)(pcs)


pcs = jax.tree.map(lambda x: jnp.stack([x] * 4), pc)
timeit("vmap(B=4) lax.sort 2key+idx 64k", f_sort_b, pcs)
