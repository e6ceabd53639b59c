"""Multi-host (multi-process) runtime scaffolding.

The reference has no distributed runtime at all (SURVEY.md §2.6: single
process + optional TBB threads). This module is the TPU-native scale-out
story past one host (SURVEY §5.8; BASELINE.md north star: >=80 % frames/s
scaling efficiency at 2+ hosts):

- ``init_from_env()``   — ``jax.distributed`` process bring-up from env
  vars (idempotent; no-op in a single-process run).
- ``make_global_mesh()`` — a (data, space) ``Mesh`` over ALL processes'
  devices, laid out so the ``space`` axis (per-align all_gathers from the
  spatially-sharded NN, ops/nn_bruteforce.py) stays INSIDE one host's
  ICI domain and only the embarrassingly-parallel ``data`` axis (whose
  per-align traffic is zero — results are independent) crosses DCN.
- ``host_local_batch()`` — build a global batch array from per-host local
  shards without replicating the whole dataset on every host (the
  host-sharded data feed for the batched odometry driver).

Verified by scripts/multihost_dryrun.py: two ``jax.distributed`` CPU
processes x 4 virtual devices run the batched align over the global
(2 hosts x 4) mesh and assert exact equality with a single-process run
(driver hook: ``__graft_entry__.py dryrun_multichip``).

Real 2+-host TPU hardware is not reachable in this image; the measurement
plan for the >=80 % target is documented in BASELINE.md.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_from_env() -> bool:
    """Initialise ``jax.distributed`` when a multi-process run is requested
    via env. Recognised variables (first match wins):

    - ``MP2P_COORDINATOR`` / ``MP2P_NUM_PROCESSES`` / ``MP2P_PROCESS_ID``
      (explicit; ``MP2P_LOCAL_DEVICE_IDS`` optional comma list)
    - standard JAX/cloud envs (``JAX_COORDINATOR_ADDRESS``...) are handled
      by ``jax.distributed.initialize()``'s own auto-detection.

    Returns True when running multi-process (after initialisation),
    False for single-process (no side effects).

    Idempotent: safe to call from every entry point (apps, bench, tests).
    """
    coord = os.environ.get("MP2P_COORDINATOR")
    nproc = os.environ.get("MP2P_NUM_PROCESSES")
    if coord is None or nproc is None or int(nproc) <= 1:
        return False
    # NOTE: must run before anything touches the XLA backend —
    # jax.process_count()/jax.devices() would themselves initialise it,
    # so idempotency is tracked by the distributed client state, not a
    # jax query
    from jax._src import distributed as _dist

    if _dist.is_initialized():
        return True
    pid = int(os.environ.get("MP2P_PROCESS_ID", "0"))
    kwargs = {}
    local_ids = os.environ.get("MP2P_LOCAL_DEVICE_IDS")
    if local_ids:
        kwargs["local_device_ids"] = [
            int(x) for x in local_ids.split(",") if x
        ]
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=pid,
        **kwargs,
    )
    return True


def make_global_mesh(
    n_space: int = 1, devices: Optional[list] = None
) -> Mesh:
    """(data, space) mesh over every process's devices, DCN-aware.

    ``space`` (the per-align all_gather axis) is constrained to one host:
    n_space must divide the per-process device count, and the device grid
    is laid out [hosts * local/space, space] so each space group's devices
    share a process (ICI, not DCN). ``data`` spans hosts — its collectives
    are nil (independent registrations), so DCN latency only touches
    result gathering.
    """
    devices = list(devices if devices is not None else jax.devices())
    per_proc = len(jax.local_devices()) if jax.process_count() > 1 else len(
        devices
    )
    if n_space > 1 and per_proc % n_space != 0:
        raise ValueError(
            f"n_space={n_space} must divide the per-host device count "
            f"({per_proc}) so the space axis stays on-host (ICI)"
        )
    n_data = len(devices) // n_space
    # jax.devices() orders by process, so a [n_data, n_space] C-order
    # reshape keeps each length-n_space row inside one process
    grid = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(grid, ("data", "space"))


def host_local_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Assemble a GLOBAL batch from each process's LOCAL shard of it.

    Every process passes only the batch rows it owns (global_batch /
    process_count of them, in process order); the returned pytree is a
    global jax.Array sharded P('data') over the mesh — no host ever
    materialises the full batch. Single-process: a plain device_put.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return x
        if jax.process_count() > 1:
            global_shape = (
                x.shape[0] * jax.process_count(),
            ) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def fetch_replicated(x):
    """Bring a (possibly multi-host) result to every host as numpy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # tiled: keep the global shape (concatenate shards along their
        # sharded axis) instead of stacking a leading process axis
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
