"""Two-process jax.distributed CPU dryrun of the multi-host batched align.

Validates parallel/multihost.py end to end without real multi-host TPU
hardware (none reachable in this image): spawns 2 coordinator-connected
CPU processes x 4 virtual devices each, builds the global (data=8, space=1)
mesh, feeds each process its HOST-LOCAL half of an 8-pair batch, runs the
batched fused align as ONE global SPMD program, and asserts every
process's gathered poses match a single-process reference bit-for-bit.

Usage:
  python scripts/multihost_dryrun.py            # parent: spawns workers
  (internal) MP2P_DRYRUN_WORKER=1 ... worker mode
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROC = 2
LOCAL_DEVICES = 4
BATCH = 8
N_POINTS = 512
PORT = int(os.environ.get("MP2P_DRYRUN_PORT", "57431"))


def _make_batch(b0, b1):
    """Scan pairs b0..b1-1 (deterministic per index)."""
    import jax.numpy as jnp

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.core.pointcloud import PointCloud
    from mp2p_icp_tpu.parallel.batch import stack_pytrees

    gs, ls, gu = [], [], []
    gt = se3.from_xyz_ypr(0.3, -0.2, 0.1, 0.05, -0.03, 0.02)
    for b in range(b0, b1):
        rng = np.random.RandomState(1000 + b)
        xyz = rng.uniform(-10, 10, (N_POINTS, 3)).astype(np.float32)
        lx = np.array(se3.apply(se3.inverse(gt), jnp.asarray(xyz)))
        gs.append({"raw": PointCloud.from_numpy(xyz)})
        ls.append({"raw": PointCloud.from_numpy(lx)})
        gu.append(se3.identity())
    return stack_pytrees(gs), stack_pytrees(ls), stack_pytrees(gu)


def _make_icp():
    from mp2p_icp_tpu.icp import ICP, ICPParameters
    from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
    from mp2p_icp_tpu.solvers.gauss_newton import GNParams
    from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

    icp = ICP(
        matchers=[MatcherPointsDistanceThreshold(threshold=1.0)],
        solvers=[
            SolverHorn(run_up_to_iteration=5),
            SolverGaussNewton(
                run_from_iteration=6, gn_params=GNParams(max_iterations=3)
            ),
        ],
    )
    return icp, ICPParameters(max_iterations=12)


def worker():
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(os.environ["MP2P_PROCESS_ID"])

    from mp2p_icp_tpu.parallel import multihost

    assert multihost.init_from_env(), "distributed init did not trigger"
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, len(jax.devices())

    import jax.numpy as jnp

    from mp2p_icp_tpu.parallel.batch import make_batched_align

    mesh = multihost.make_global_mesh(n_space=1)
    assert mesh.devices.shape == (N_PROC * LOCAL_DEVICES, 1)

    icp, params = _make_icp()
    per = BATCH // N_PROC
    l_loc, g_loc, u_loc = None, None, None
    g_b, l_b, u_b = _make_batch(pid * per, (pid + 1) * per)
    with mesh:
        g_g = multihost.host_local_batch(mesh, g_b)
        l_g = multihost.host_local_batch(mesh, l_b)
        u_g = multihost.host_local_batch(mesh, u_b)
        fb = make_batched_align(icp, params)
        rb = fb(l_g, g_g, u_g)
        t_all = multihost.fetch_replicated(rb.optimal_tf.t)  # [B, 3]
        R_all = multihost.fetch_replicated(rb.optimal_tf.R)

    # single-process reference: the same batch, unsharded, on this
    # process's local CPU devices only (plain vmap, no mesh)
    g_ref, l_ref, u_ref = _make_batch(0, BATCH)
    rb_ref = make_batched_align(icp, params)(l_ref, g_ref, u_ref)
    t_ref = np.asarray(rb_ref.optimal_tf.t)
    R_ref = np.asarray(rb_ref.optimal_tf.R)

    t_err = float(np.abs(t_all.reshape(BATCH, 3) - t_ref).max())
    R_err = float(np.abs(R_all.reshape(BATCH, 3, 3) - R_ref).max())
    print(
        json.dumps(
            {
                "process": pid,
                "processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "t_err": t_err,
                "R_err": R_err,
                "ok": bool(t_err < 1e-5 and R_err < 1e-5),
            }
        ),
        flush=True,
    )
    assert t_err < 1e-5 and R_err < 1e-5, (t_err, R_err)


def parent():
    env_common = dict(
        os.environ,
        MP2P_DRYRUN_WORKER="1",
        MP2P_COORDINATOR=f"localhost:{PORT}",
        MP2P_NUM_PROCESSES=str(N_PROC),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
        ).strip(),
    )
    # this image's sitecustomize registers the axon TPU PJRT plugin at
    # interpreter start when PALLAS_AXON_POOL_IPS is set — that both
    # initialises the XLA backend (breaking jax.distributed.initialize)
    # and would contend for the EXCLUSIVE single TPU; strip it so the
    # workers come up pure-CPU
    for k in list(env_common):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env_common.pop(k)
    procs = []
    for pid in range(N_PROC):
        env = dict(env_common, MP2P_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        print(f"--- process {pid} (rc={p.returncode}) ---")
        print(out)
        if p.returncode != 0:
            print(err[-3000:])
            ok = False
    print(json.dumps({"multihost_dryrun_ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    if os.environ.get("MP2P_DRYRUN_WORKER") == "1":
        worker()
    else:
        sys.exit(parent())
