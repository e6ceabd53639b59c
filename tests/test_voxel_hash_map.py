"""Incremental voxel hash map (ops/voxel_hash_map.py) correctness.

Oracle: the sort-based voxel path (ops/voxel_unique.py) and a plain
numpy first-seen-per-voxel dict — the reference's FirstPoint insertion
order (FilterDecimateVoxels.cpp:244-270)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.decimate_voxels import (
    DecimateMethod, FilterDecimateVoxels,
)
from mp2p_icp_tpu.ops.voxel_hash_map import (
    empty_voxel_hash_map, hash_decimate_first_point, hash_map_insert,
)


def _np_first_point(xyz, res):
    """First-seen representative per voxel, insertion order."""
    seen = {}
    for p in xyz:
        c = tuple(np.floor(p / res).astype(np.int64))
        if c not in seen:
            seen[c] = p
    return np.asarray(list(seen.values()))


def _make_cloud(rng, n, cap, spread=20.0):
    xyz = rng.randn(n, 3).astype(np.float32) * spread
    return PointCloud.from_numpy(xyz, capacity=cap), xyz


def test_single_insert_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    pc, xyz = _make_cloud(rng, 500, 512, spread=3.0)  # heavy duplication
    res = 1.0
    state = empty_voxel_hash_map(1024)
    state = jax.jit(
        lambda s, p: hash_map_insert(s, p, res)
    )(state, pc)
    want = _np_first_point(xyz, res)
    got = np.asarray(state.pc.xyz[: int(state.pc.count)])
    assert int(state.pc.count) == want.shape[0]
    np.testing.assert_array_equal(got, want)  # exact order + positions
    assert int(state.n_dropped) == 0


def test_incremental_inserts_match_batch_oracle():
    rng = np.random.RandomState(1)
    res = 0.5
    state = empty_voxel_hash_map(4096)
    all_xyz = []
    insert = jax.jit(lambda s, p: hash_map_insert(s, p, res))
    for _ in range(6):
        pc, xyz = _make_cloud(rng, 700, 1024, spread=5.0)
        state = insert(state, pc)
        all_xyz.append(xyz)
    want = _np_first_point(np.concatenate(all_xyz), res)
    got = np.asarray(state.pc.xyz[: int(state.pc.count)])
    assert int(state.pc.count) == want.shape[0]
    np.testing.assert_array_equal(got, want)
    assert int(state.n_dropped) == 0


def test_buffer_overflow_rolls_back_table():
    rng = np.random.RandomState(2)
    res = 0.5
    # tiny buffer: only 8 voxels fit
    state = empty_voxel_hash_map(8)
    pc, xyz = _make_cloud(rng, 64, 64, spread=50.0)  # ~64 distinct voxels
    state = jax.jit(lambda s, p: hash_map_insert(s, p, res))(state, pc)
    assert int(state.pc.count) == 8
    assert int(state.n_dropped) > 0
    # overflowed voxels stayed OPEN: inserting the same points again with
    # a fresh big buffer state seeded from this table would accept them.
    # Here simply assert the table has exactly `count` occupied slots.
    occ = int(np.sum(np.asarray(state.table_k1) != 2147483647))
    assert occ == 8


def test_channels_ride_insert():
    rng = np.random.RandomState(3)
    xyz = rng.randn(100, 3).astype(np.float32) * 4.0
    inten = rng.rand(100).astype(np.float32)
    pc = PointCloud.from_numpy(xyz, capacity=128, intensity=inten)
    state = empty_voxel_hash_map(256, intensity=True)
    state = hash_map_insert(state, pc, 1.0)
    n = int(state.pc.count)
    got_xyz = np.asarray(state.pc.xyz[:n])
    got_i = np.asarray(state.pc.intensity[:n])
    # every output (xyz, intensity) pair exists in the input pairing
    lut = {tuple(np.round(x, 5)): i for x, i in zip(xyz, inten)}
    for x, i in zip(got_xyz, got_i):
        assert abs(lut[tuple(np.round(x, 5))] - i) < 1e-6


def test_hash_decimate_matches_sort_backend_voxel_set():
    rng = np.random.RandomState(4)
    pc, xyz = _make_cloud(rng, 3000, 4096, spread=10.0)
    res = 0.75
    # capacity > n_voxels: on overflow the two backends keep DIFFERENT
    # subsets (sort: first in voxel order; hash: first in input order)
    f_sort = FilterDecimateVoxels(
        input_pointcloud_layer=("raw",), output_pointcloud_layer="out",
        voxel_filter_resolution=res, output_capacity=4096,
    )
    f_hash = FilterDecimateVoxels(
        input_pointcloud_layer=("raw",), output_pointcloud_layer="out",
        voxel_filter_resolution=res, output_capacity=4096, backend="hash",
    )
    a = f_sort({"raw": pc})["out"]
    b = f_hash({"raw": pc})["out"]
    assert int(a.count) == int(b.count)
    sa = {tuple(np.round(p, 5)) for p in np.asarray(a.xyz[: int(a.count)])}
    sb = {tuple(np.round(p, 5)) for p in np.asarray(b.xyz[: int(b.count)])}
    assert sa == sb  # same winners (FirstPoint = lowest input index)


def test_hash_decimate_rejects_unsupported_modes():
    f = FilterDecimateVoxels(backend="hash",
                             decimate_method=DecimateMethod.VOXEL_AVERAGE)
    with pytest.raises(ValueError):
        f({"raw": PointCloud.from_numpy(np.zeros((4, 3)), capacity=8)})
    f2 = FilterDecimateVoxels(backend="hash", flatten_to=0.0)
    with pytest.raises(ValueError):
        f2({"raw": PointCloud.from_numpy(np.zeros((4, 3)), capacity=8)})


def test_insert_under_vmap():
    """The batched odometry path vmaps the insert."""
    rng = np.random.RandomState(5)
    res = 1.0
    B = 3
    pcs, xyzs = zip(*[_make_cloud(rng, 200, 256, spread=4.0)
                      for _ in range(B)])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pcs)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[empty_voxel_hash_map(512) for _ in range(B)],
    )
    out = jax.jit(jax.vmap(
        lambda s, p: hash_map_insert(s, p, res)
    ))(states, stacked)
    for b in range(B):
        want = _np_first_point(xyzs[b], res)
        n = int(out.pc.count[b])
        assert n == want.shape[0]
        np.testing.assert_array_equal(
            np.asarray(out.pc.xyz[b, :n]), want
        )


def test_decimate_one_shot_equals_map_insert():
    rng = np.random.RandomState(6)
    pc, xyz = _make_cloud(rng, 1000, 1024, spread=6.0)
    out = hash_decimate_first_point(pc, 0.5, 1024)
    want = _np_first_point(xyz, 0.5)
    n = int(out.count)
    assert n == want.shape[0]
    np.testing.assert_array_equal(np.asarray(out.xyz[:n]), want)
