"""Decompose knn_bruteforce k=1 wrapper cost on the TPU.

Chained-in-one-jit timing per CLAUDE.md: enqueue reps dispatches of a
jitted chain of n bodies, fetch one scalar from the last result.
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import mp2p_icp_tpu  # noqa: F401  (pins matmul precision)
from mp2p_icp_tpu.ops import nn_bruteforce as nb

N = 8192
rng = np.random.RandomState(0)
q = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
p = jnp.asarray(rng.uniform(-60, 60, (N, 3)).astype(np.float32))
qv = jnp.ones((N,), bool)
pv = jnp.ones((N,), bool)

n_chain, reps = 20, 5
res = {}

def timed(name, fn, *args):
    jfn = jax.jit(fn)
    _ = float(jfn(*args))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = jfn(*args)
    _ = float(out)
    res[name] = (time.perf_counter() - t0) / (n_chain * reps) * 1e3
    print(f"{name:24s} {res[name]:8.4f} ms", flush=True)

# 1. full wrapper
def full_chain(qq, qvv, pp, pvv):
    s = jnp.float32(0.0)
    for _ in range(n_chain):
        r = nb.knn_bruteforce(qq + s * 0.0, qvv, pp, pvv, k=1,
                              max_radius_sq=4.0)
        s = r.dist_sq[0, 0]
    return s

timed("full_knn_k1", full_chain, q, qv, p, pv)

# 2. augment only (both q and p paths)
far = 1.0e8
Qp = nb._round_up(N, 512)
Cp = nb._round_up(N, 256)

def aug_chain(qq, pp):
    s = jnp.float32(0.0)
    for _ in range(n_chain):
        qa, pa = nb._augment_bf16(qq + s * 0.0, pp, Qp, Cp, far)
        s = qa[0, 0].astype(jnp.float32)
    return s

timed("augment_q_and_p", aug_chain, q, p)

# 2b. augment q only (the per-iteration part: p is loop-invariant)
def augq_chain(qq):
    s = jnp.float32(0.0)
    for _ in range(n_chain):
        qT = jnp.concatenate(
            [(qq + s * 0.0).T, jnp.full((3, Qp - N), far, jnp.float32)],
            axis=1)
        qa = nb._augment_q(qT)
        s = qa[0, 0].astype(jnp.float32)
    return s

timed("augment_q_only", augq_chain, q)

# 3. kernel only on pre-augmented inputs
qa0, pa0 = jax.jit(
    lambda a, b: nb._augment_bf16(a, b, Qp, Cp, far))(q, p)

def kern_chain(qa, pa):
    s = jnp.bfloat16(0.0)
    for _ in range(n_chain):
        pd, pi = nb._nnk_pallas_gridless(
            qa + s * 0, pa, 1, block_c=256)
        s = pd[0, 0].astype(jnp.bfloat16)
    return s.astype(jnp.float32)

timed("kernel_only", kern_chain, qa0, pa0)

# 4. kernel + transpose/post (d2, radius mask) — no augment
def kernpost_chain(qa, pa, qq):
    qn = jnp.sum(qq * qq, axis=1)
    s = jnp.bfloat16(0.0)
    for _ in range(n_chain):
        pd, pi = nb._nnk_pallas_gridless(qa + s * 0, pa, 1, block_c=256)
        idx = pi.T[:N]
        pdist = pd.T[:N]
        d2 = jnp.maximum(pdist + qn[:, None], 0.0)
        valid = (idx >= 0) & (idx < N) & (d2 < 1.0e15) & (d2 <= 4.0)
        s = jnp.where(valid[0, 0], d2[0, 0], 0.0).astype(jnp.bfloat16)
    return s.astype(jnp.float32)

timed("kernel_plus_post", kernpost_chain, qa0, pa0, q)

print({k: round(v, 4) for k, v in res.items()})
