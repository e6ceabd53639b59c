import time
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.icp import ICP, ICPParameters
from mp2p_icp_tpu.matchers import MatcherPointsDistanceThreshold
from mp2p_icp_tpu.matchers.base import LayerMatch
from mp2p_icp_tpu.solvers.gauss_newton import GNParams
from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

def corridor_scene(rng2, n, length=400.0):
    t = rng2.uniform(0, length, n)
    kind = rng2.randint(0, 4, n)
    y = np.where(kind == 0, -6.0, np.where(kind == 1, 6.0, rng2.uniform(-6, 6, n)))
    z = np.where(kind < 2, rng2.uniform(0, 4, n), np.where(kind == 2, 0.0, rng2.uniform(0, 2.5, n)))
    x = np.where(kind == 3, np.round(t / 25.0) * 25.0, t)
    return np.stack([x, y, z], 1).astype(np.float32)

rng2 = np.random.RandomState(33)
corridor = corridor_scene(rng2, 1 << 21)
gmap2 = PointCloud.from_numpy(corridor, capacity=1 << 21)

def local_window(scene_pts, cx, rng3, n=8192, radius=50.0):
    m = np.abs(scene_pts[:, 0] - cx) < radius
    pts = scene_pts[m]
    idx = rng3.choice(pts.shape[0], size=n, replace=False)
    return (pts[idx] + 0.02 * rng3.randn(n, 3)).astype(np.float32)

scan = local_window(corridor, 200.0, np.random.RandomState(34))
sensor = se3.from_xyz_ypr(200.0, 0.0, 1.5, 0.0, 0.0, 0.0)
gt_err = se3.from_xyz_ypr(0.9, 0.2, 0.02, 0.02, 0.003, -0.004)
gt2 = se3.compose(sensor, gt_err)
lx = np.array(se3.apply(se3.inverse(gt2), jnp.asarray(scan)))
lm_layers = {"raw": PointCloud.from_numpy(lx, capacity=8192)}
icp2 = ICP(
    matchers=[MatcherPointsDistanceThreshold(threshold=2.0,
        layer_matches=(LayerMatch(global_layer="map", local_layer="raw"),))],
    solvers=[SolverHorn(run_up_to_iteration=5),
             SolverGaussNewton(run_from_iteration=6, gn_params=GNParams(max_iterations=3))],
)
p3 = ICPParameters(max_iterations=40, crop_capacity=1 << 18, crop_extra_margin=4.0)

def timeit(name, fn, *args, reps=8):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print("%s: %.1f ms" % (name, dt), flush=True)
    return dt

# full streamed align
r3 = icp2.align(lm_layers, {"map": gmap2}, sensor, p3)
err = float(se3.error_log_norm(gt2, r3.optimal_tf))
iters = int(r3.n_iterations)
print("align err %.4f iters %d" % (err, iters), flush=True)
timeit("full streamed align", lambda: icp2.align(lm_layers, {"map": gmap2}, sensor, p3).optimal_tf.t)

# crop-only program
matchers = tuple(icp2.matchers)
@jax.jit
def crop_only(g_layers, l_layers, guess):
    out, idx = icp2._crop_globals(p3, matchers, g_layers, l_layers, guess)
    return out["map"].xyz
timeit("crop only (2M argsort)", crop_only, {"map": gmap2}, lm_layers, sensor)

# NN-only on a 256k crop, 13 sweeps chained
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce
crop_pts = np.asarray(jax.device_get(crop_only({"map": gmap2}, lm_layers, sensor)))
cp = jnp.asarray(crop_pts)
cv = jnp.all(jnp.abs(cp) < 1e7, axis=1)
qd = jnp.asarray(lx); qv = jnp.ones(8192, bool)
@jax.jit
def nn13(qd, cp, cv):
    s = jnp.float32(0.0)
    for _ in range(13):
        r = knn_bruteforce(qd + s*0.0, qv, cp, cv, k=1, max_radius_sq=4.0)
        s = r.dist_sq[0, 0]
    return s
timeit("13x NN sweeps over 256k crop", nn13, qd, cp, cv)
