import os, sys, time
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce

mode = sys.argv[1]  # 'dbuf' or 'legacy'
os.environ["MP2P_NN_STREAM_DBUF"] = "1" if mode == "dbuf" else "0"

rng = np.random.RandomState(0)
C = 1 << 21
Q = 8192
p = rng.uniform(-100, 100, (C, 3)).astype(np.float32)
q = (p[rng.choice(C, Q, replace=False)] + 0.05*rng.randn(Q,3)).astype(np.float32)
qd, pd = jnp.asarray(q), jnp.asarray(p)
qv = jnp.ones(Q, bool); pv = jnp.ones(C, bool)

def chain(qd, pd):
    s = jnp.float32(0.0)
    for _ in range(4):
        r = knn_bruteforce(qd + s*0.0, qv, pd, pv, k=1, max_radius_sq=4.0)
        s = r.dist_sq[0, 0]
    return s
f = jax.jit(chain)
t0 = time.perf_counter()
_ = float(f(qd, pd))
print(mode, "compile+first: %.1fs" % (time.perf_counter()-t0), flush=True)
t0 = time.perf_counter()
for _ in range(5):
    out = f(qd, pd)
_ = float(out)
dt = (time.perf_counter()-t0)/20
print(mode, "8k x 2M streamed k=1 sweep: %.2f ms" % (dt*1e3), flush=True)
# correctness spot check vs xla
r = knn_bruteforce(qd, qv, pd, pv, k=3, max_radius_sq=4.0)
r2 = knn_bruteforce(qd, qv, pd, pv, k=3, max_radius_sq=4.0, backend="xla")
i1, i2 = np.asarray(r.idx), np.asarray(r2.idx)
agree = (i1[:,0] == i2[:,0]).mean()
print(mode, "k=3 1st-nn agreement vs xla: %.4f" % agree, flush=True)
d1, d2 = np.asarray(r.dist_sq), np.asarray(r2.dist_sq)
print(mode, "max |d2 diff| (valid):", float(np.max(np.abs(np.where(d1<1e30, d1-d2, 0)))), flush=True)
