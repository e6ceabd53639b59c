"""Device-mesh plumbing for multi-chip scaling.

The reference has NO distributed runtime (SURVEY.md §2.6 — single process,
optional TBB threads; batch scale-out drives the CLI per frame pair,
scripts/kitti-run-seq.py). This module is the greenfield TPU-native
replacement: a ``jax.sharding.Mesh`` with two logical axes —

- ``data``:  batch of independent scan-pair registrations (the DP axis;
             the kitti-run-seq.py loop becomes one sharded program);
- ``space``: spatial sharding of per-pair tensors — pairing blocks and map
             shards (the SP/CP analogue; solver reductions become psums
             over ICI inserted automatically by XLA from sharded einsums).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    if n_data * n_space > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {n_data * n_space} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev_array, ("data", "space"))


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Place a batched pytree with its leading axis split over the 'data'
    mesh axis (replicated over 'space')."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, tree)
