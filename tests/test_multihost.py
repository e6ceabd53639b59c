"""Multi-host runtime scaffolding tests (SURVEY §5.8; VERDICT r2 Missing #2).

The real thing — two ``jax.distributed`` CPU processes running ONE global
SPMD batched align with host-local data feed — must run in fresh
subprocesses (jax.distributed.initialize must precede any backend touch),
so the heavyweight test shells out to scripts/multihost_dryrun.py.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_make_global_mesh_single_process():
    from mp2p_icp_tpu.parallel.multihost import make_global_mesh

    mesh = make_global_mesh(n_space=2)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape[1] == 2

    with pytest.raises(ValueError):
        make_global_mesh(n_space=3)  # does not divide 8


def test_host_local_batch_single_process():
    import jax.numpy as jnp

    from mp2p_icp_tpu.parallel.multihost import (
        fetch_replicated,
        host_local_batch,
        make_global_mesh,
    )

    mesh = make_global_mesh(n_space=1)
    x = {"a": jnp.arange(16.0).reshape(8, 2), "s": 3}
    g = host_local_batch(mesh, x)
    assert g["s"] == 3
    np.testing.assert_array_equal(fetch_replicated(g["a"]), np.asarray(x["a"]))


def test_init_from_env_noop_without_env(monkeypatch):
    from mp2p_icp_tpu.parallel import multihost

    monkeypatch.delenv("MP2P_COORDINATOR", raising=False)
    monkeypatch.delenv("MP2P_NUM_PROCESSES", raising=False)
    assert multihost.init_from_env() is False


def test_two_process_dryrun():
    """2 jax.distributed CPU processes x 4 devices: global batched align
    equals single-process bit-for-bit (the full multi-host code path:
    init_from_env -> make_global_mesh -> host_local_batch ->
    fetch_replicated)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_dryrun.py")],
        capture_output=True,
        text=True,
        timeout=900,
        env={
            k: v
            for k, v in os.environ.items()
            # the workers must own their backend setup
            if not k.startswith(("PALLAS_AXON", "AXON_", "XLA_FLAGS"))
        },
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert '"multihost_dryrun_ok": true' in r.stdout
