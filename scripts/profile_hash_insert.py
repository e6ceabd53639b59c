"""Microbench the voxel hash insert primitives on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mp2p_icp_tpu.core.pointcloud import PointCloud  # noqa: E402
from mp2p_icp_tpu.ops.voxel_hash_map import (  # noqa: E402
    empty_voxel_hash_map, hash_map_insert,
)

rng = np.random.RandomState(0)


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1e3:8.3f} ms")
    return out


# one-shot decimation shape: 65536 points -> ~3.5k voxels
xyz = np.zeros((65536, 3), np.float32)
xyz[:36864] = rng.randn(36864, 3) * 30.0
pc_local = PointCloud(xyz=jnp.asarray(xyz),
                      count=jnp.asarray(36864, jnp.int32))
st_local = empty_voxel_hash_map(6144)
f1 = jax.jit(lambda s, p: hash_map_insert(s, p, 0.5))
timeit("decimate-shape insert 64k->6k table 32k", f1, st_local, pc_local)

# map-insert shape: 6144 new points into a 32k-capacity map
xyz2 = np.zeros((6144, 3), np.float32)
xyz2[:3500] = rng.randn(3500, 3) * 30.0
pc_new = PointCloud(xyz=jnp.asarray(xyz2), count=jnp.asarray(3500, jnp.int32))
st_map = empty_voxel_hash_map(1 << 15)
xyz3 = rng.randn(13000, 3).astype(np.float32) * 30.0
pc_seed = PointCloud.from_numpy(xyz3, capacity=1 << 14)
f2 = jax.jit(lambda s, p: hash_map_insert(s, p, 0.5))
st_map = f2(st_map, pc_seed)
timeit("map insert 6k new into 32k-cap map", f2, st_map, pc_new)

# how many rounds does the loop actually run? instrument via a copy
from mp2p_icp_tpu.ops import voxel_hash_map as vhm  # noqa: E402


def rounds_probe(state, new, res):
    T = state.table_k1.shape[0]
    N = new.capacity
    smask = T - 1
    valid = new.valid_mask()
    k1, k2, h = vhm.voxel_keys(new.xyz, valid, res)
    slot0 = h & smask
    idx = jnp.arange(N, dtype=jnp.int32)

    def cond(c):
        return jnp.any(c[2]) & (c[6] < 48)

    def body(c):
        tk1, tk2, pending, probe, win_slot, exn, rounds = c
        slot = (slot0 + probe) & smask
        g1 = tk1[slot]
        g2 = tk2[slot]
        is_dup = pending & (g1 == k1) & (g2 == k2)
        is_empty = pending & (g1 == vhm._SENTINEL)
        occ = pending & ~is_dup & ~is_empty
        claim = (jnp.full((T,), N, jnp.int32)
                 .at[jnp.where(is_empty, slot, T)]
                 .min(jnp.where(is_empty, idx, N), mode="drop"))
        winner = is_empty & (claim[slot] == idx)
        wslot = jnp.where(winner, slot, T)
        tk1 = (jnp.concatenate([tk1, jnp.full((1,), vhm._SENTINEL, jnp.int32)])
               .at[wslot].set(jnp.where(winner, k1, vhm._SENTINEL))[:T])
        tk2 = (jnp.concatenate([tk2, jnp.full((1,), vhm._SENTINEL, jnp.int32)])
               .at[wslot].set(jnp.where(winner, k2, vhm._SENTINEL))[:T])
        win_slot = jnp.where(winner, slot, win_slot)
        pending = pending & ~is_dup & ~winner
        probe = probe + occ.astype(jnp.int32)
        ex = pending & (probe >= 12)
        pending = pending & ~ex
        return (tk1, tk2, pending, probe, win_slot,
                exn + jnp.sum(ex.astype(jnp.int32)), rounds + 1)

    init = (state.table_k1, state.table_k2, valid,
            jnp.zeros((N,), jnp.int32), jnp.full((N,), T, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    return out[6], out[5]


r1, e1 = jax.jit(lambda s, p: rounds_probe(s, p, 0.5))(
    empty_voxel_hash_map(6144), pc_local)
print(f"decimate rounds={int(r1)} exhausted={int(e1)}")
r2, e2 = jax.jit(lambda s, p: rounds_probe(s, p, 0.5))(st_map, pc_new)
print(f"map-insert rounds={int(r2)} exhausted={int(e2)}")

# isolate: one scatter round cost at the decimate shape
T = st_local.table_k1.shape[0]
N = pc_local.capacity


@jax.jit
def one_round(tk1, slot, k1v, winner):
    wslot = jnp.where(winner, slot, T)
    return (jnp.concatenate([tk1, jnp.zeros((1,), jnp.int32)])
            .at[wslot].set(k1v)[:T])


tk1 = st_local.table_k1
slot = jnp.asarray(rng.randint(0, T, N), jnp.int32)
k1v = jnp.asarray(rng.randint(0, 1 << 30, N), jnp.int32)
winner = jnp.asarray(rng.rand(N) < 0.05)
timeit("single 64k scatter into 32k table", one_round, tk1, slot, k1v, winner)


@jax.jit
def one_claim(slot, winner):
    idx = jnp.arange(N, dtype=jnp.int32)
    return (jnp.full((T,), N, jnp.int32)
            .at[jnp.where(winner, slot, T)]
            .min(jnp.where(winner, idx, N), mode="drop"))


timeit("single 64k scatter-min claim", one_claim, slot, winner)


@jax.jit
def one_gather(tk1, slot):
    return tk1[slot]


timeit("single 64k gather from 32k table", one_gather, tk1, slot)
