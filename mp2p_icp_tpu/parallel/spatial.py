"""True spatial sharding: the global map partitioned across devices.

SURVEY §5.7/§5.8 and VERDICT r1 Missing #5: the SP/CP analogue for
registration is partitioning the global map's points over the mesh 'space'
axis. Each device sweeps ONLY its shard with the MXU brute-force NN; the
per-query (dist, global idx, xyz) k-lists are merged with one all_gather
over ICI (ops.nn_bruteforce spatial_axis path); everything downstream of
the matcher (solver reductions, termination, quality) is replicated —
redundant but tiny next to the NN sweep, so no psum choreography is needed
and the align loop stays a single fused shard_map program.

The reference has no distributed backend at all (SURVEY §2.6); its
single-host answer to big maps is the lazy KD-tree. Here an N-device slice
holds an N× larger map in HBM and splits the sweep N ways.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters


def shard_global_layers(
    g_layers: Dict[str, PointCloud], n_shards: int
) -> Dict[str, PointCloud]:
    """Host-side split of each layer into n stacked shard clouds with
    correct per-shard counts: xyz [n, C/n, 3], count [n]. Feed through
    shard_map in_specs=P('space') so each device gets one shard."""
    out = {}
    for name, pc in g_layers.items():
        C = pc.capacity
        Cs = -(-C // n_shards)
        pad = n_shards * Cs - C
        xyz = np.asarray(pc.xyz)
        if pad:
            xyz = np.concatenate(
                [xyz, np.full((pad, 3), PointCloud.PAD_VALUE, np.float32)]
            )
        counts = np.clip(
            int(pc.count) - Cs * np.arange(n_shards), 0, Cs
        ).astype(np.int32)

        def shard_ch(ch):
            if ch is None:
                return None
            a = np.asarray(ch)
            if pad:
                a = np.concatenate([a, np.zeros(pad, a.dtype)])
            return jnp.asarray(a.reshape(n_shards, Cs))

        out[name] = PointCloud(
            xyz=jnp.asarray(xyz.reshape(n_shards, Cs, 3)),
            count=jnp.asarray(counts),
            intensity=shard_ch(pc.intensity),
            ring=shard_ch(pc.ring),
            time=shard_ch(pc.time),
        )
    return out


def make_spatial_align(icp: ICP, params: ICPParameters, mesh,
                       axis: str = "space"):
    """Jitted align with the global map 'space'-sharded.

    Returns fn(l_layers, g_sharded, guess) -> ICPResults (replicated).
    g_sharded comes from shard_global_layers(g, mesh.shape[axis]).
    Matchers must be spatial-capable (MatcherPointsDistanceThreshold,
    MatcherAdaptive, MatcherPointsInlierRatio); several matchers may share
    a schedule segment — cross-matcher paired bitfields use GLOBAL ids
    spanning all shards (matchers/base.MatchState.create global_scale).

    Maps larger than one device: when a SHARD's capacity still exceeds
    params.crop_capacity, each device first crops ITS shard to the local
    scan bbox (ICP._crop_globals, per-shard independently — global ids
    then address the cropped shard, consistently on every device because
    the crop is deterministic), and shards past the VMEM budget stream
    through HBM superblocks as usual. This composes the SP axis with the
    scan-to-large-map path (VERDICT r2 Missing #4). NOTE: per-shard crop
    OVERFLOW (stride decimation) can pick a slightly different candidate
    subset than an unsharded crop of the same map — size crop_capacity so
    in-box points fit when exact equality matters."""
    n_shards = int(mesh.shape[axis])
    adj = []
    for m in icp.matchers:
        if not hasattr(m, "spatial_axis"):
            raise NotImplementedError(
                f"{type(m).__name__} has no spatial_axis support"
            )
        kw = {"spatial_axis": axis}
        if hasattr(m, "spatial_num_shards"):
            kw["spatial_num_shards"] = n_shards
        adj.append(dataclasses.replace(m, **kw))
    matchers = tuple(adj)

    def body(l_layers, g_sharded, guess):
        # squeeze the shard axis: inside shard_map each device holds [1,...]
        g_local = jax.tree_util.tree_map(lambda x: x[0], g_sharded)
        # per-shard bbox crop for maps past crop_capacity per device;
        # crop index maps are dropped here — sharded pairings record
        # shard-local cropped ids (coords ride NNResult.xyz instead)
        g_local, _ = icp._crop_globals(params, matchers, g_local, l_layers,
                                       guess)
        return icp._align_core(
            params, matchers, {}, g_local, l_layers, guess, None
        )

    sharded = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    return sharded
