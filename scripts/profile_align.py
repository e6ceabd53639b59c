"""Per-stage device-time breakdown of one scan2scan align on the real TPU.

Timing recipe (CLAUDE.md): jax.block_until_ready does NOT block on the
axon platform — enqueue N dependency-chained calls inside ONE jit, then
fetch ONE scalar from the last result; device execution is serial so the
fetch bounds all N. Per-stage numbers are device time with dispatch
amortised away.

Stages measured (the bench.py KITTI-style schedule):
  - nn_k1        : the gridless pallas kNN sweep, k=1 (DT matcher)
  - nn_k3        : same, k=3 (Adaptive matcher)
  - dt_match     : full MatcherPointsDistanceThreshold.match
  - ad_match     : full MatcherAdaptive.match
  - horn_solve   : SolverHorn on DT pairings
  - gn_solve     : SolverGaussNewton (3 inner iters, GemanMcClure)
  - dt_iter      : one DT+Horn loop body
  - ad_iter      : one Adaptive+GN loop body
  - full_align   : the whole fused align program (per align)

Usage: python scripts/profile_align.py [n_chain]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import make_scene, sample_scan
    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.core.pointcloud import PointCloud
    from mp2p_icp_tpu.icp import ICP, ICPParameters
    from mp2p_icp_tpu.matchers import (
        MatcherAdaptive,
        MatcherPointsDistanceThreshold,
    )
    from mp2p_icp_tpu.matchers.base import MatchContext
    from mp2p_icp_tpu.solvers.gauss_newton import GNParams
    from mp2p_icp_tpu.solvers.robust import RobustKernel
    from mp2p_icp_tpu.solvers.solver import SolverGaussNewton, SolverHorn

    rng = np.random.RandomState(0)
    scene = make_scene(rng)
    gt = se3.from_xyz_ypr(1.1, 0.05, 0.01, 0.01, 0.002, 0.001)
    g_scan = sample_scan(scene, np.random.RandomState(1))
    l_scan_world = sample_scan(scene, np.random.RandomState(2))
    local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(l_scan_world)))

    g_layers = {"raw": PointCloud.from_numpy(g_scan)}
    l_layers = {"raw": PointCloud.from_numpy(local_xyz)}

    dt_matcher = MatcherPointsDistanceThreshold(
        threshold=2.0, run_up_to_iteration=5
    )
    ad_matcher = MatcherAdaptive(
        confidence_interval=0.75,
        first_to_second_distance_max=1.2,
        absolute_max_search_distance=2.0,
        run_from_iteration=6,
    )
    horn = SolverHorn(run_up_to_iteration=5)
    gn = SolverGaussNewton(
        run_from_iteration=6,
        gn_params=GNParams(
            max_iterations=3,
            kernel=RobustKernel.GEMAN_MCCLURE,
            kernel_param=0.15,
        ),
    )
    icp = ICP(matchers=[dt_matcher, ad_matcher], solvers=[horn, gn])
    params = ICPParameters(max_iterations=40)
    guess = se3.identity()

    timings = {}

    def timed(name, fn, *args, n=n_chain, reps=10):
        """jit(fn chained n times); enqueue `reps` dispatches back-to-back
        and fetch ONE scalar from the last — amortises both the ~1 ms
        dispatch tax and the ~20 ms fetch round trip over reps*n units.
        Device arrays must arrive via *args, never as jit-closure
        constants: closure constants are re-staged per call through the
        tunnel (~3 ms per 100 KB, CLAUDE.md) and would inflate every
        per-stage number this script exists to measure."""
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = float(out)  # warmup + compile + true sync
        t0 = time.perf_counter()
        for _i in range(reps):
            out = jfn(*args)
        _ = float(out)
        dt = time.perf_counter() - t0
        timings[name] = dt / (n * reps) * 1e3  # ms per unit
        print(f"{name:16s} {timings[name]:8.3f} ms", flush=True)

    gxyz = g_layers["raw"].xyz
    gvalid = g_layers["raw"].valid_mask()
    lxyz = l_layers["raw"].xyz
    lvalid = l_layers["raw"].valid_mask()

    from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce

    # --- raw NN sweeps: chain by adding 0*prev to the queries
    def chain_nn(k):
        def fn(q, lv, gx, gv):
            s = jnp.float32(0.0)
            for _ in range(n_chain):
                r = knn_bruteforce(
                    q + s * 0.0, lv, gx, gv, k=k,
                    max_radius_sq=4.0,
                )
                s = r.dist_sq[0, 0]
            return s

        return fn

    timed("nn_k1", chain_nn(1), lxyz, lvalid, gxyz, gvalid)
    timed("nn_k3", chain_nn(3), lxyz, lvalid, gxyz, gvalid)

    # --- full matcher .match() calls
    def chain_match(m):
        def fn(t, g_l, l_l):
            s = jnp.float32(0.0)
            for _ in range(n_chain):
                pose = se3.Pose(jnp.eye(3), t + s * 0.0)
                blocks, _, _ = m.match(
                    {}, g_l, l_l, pose, None,
                    MatchContext(icp_iteration=jnp.asarray(0, jnp.int32)),
                )
                s = blocks["pt2pt"].weight[0]
            return s

        return fn

    timed("dt_match", chain_match(dt_matcher), jnp.zeros(3),
          g_layers, l_layers)
    timed("ad_match", chain_match(ad_matcher), jnp.zeros(3),
          g_layers, l_layers)

    # --- solvers on a fixed pairings struct
    pairings = icp._run_matchers(
        (dt_matcher, ad_matcher), (True, True), {}, g_layers, l_layers,
        guess, jnp.asarray(0, jnp.int32)
    )

    def chain_solve(s):
        def fn(t, prs):
            acc = jnp.float32(0.0)
            for _ in range(n_chain):
                pose = se3.Pose(jnp.eye(3), t + acc * 0.0)
                new = s.solve(prs, pose, None)
                acc = new.t[0]
            return acc

        return fn

    timed("horn_solve", chain_solve(horn), jnp.zeros(3), pairings)
    timed("gn_solve", chain_solve(gn), jnp.zeros(3), pairings)

    # --- one full loop-body iteration per segment type
    def chain_iter(m_active, s_active):
        def fn(t, g_l, l_l):
            acc = jnp.float32(0.0)
            fin = jnp.zeros((len(icp.solvers),), bool)
            for _ in range(n_chain):
                pose = se3.Pose(jnp.eye(3), t + acc * 0.0)
                prs = icp._run_matchers(
                    (dt_matcher, ad_matcher), m_active, {}, g_l,
                    l_l, pose, jnp.asarray(0, jnp.int32)
                )
                new, fin = icp._run_solvers(
                    prs, pose, jnp.asarray(0, jnp.int32),
                    jnp.float32(1.0), jnp.asarray(False), None,
                    s_active, fin,
                )
                acc = new.t[0]
            return acc

        return fn

    timed("dt_iter", chain_iter((True, False), (True, False)),
          jnp.zeros(3), g_layers, l_layers)
    timed("ad_iter", chain_iter((False, True), (False, True)),
          jnp.zeros(3), g_layers, l_layers)

    # --- full align, honest sync (N sequential dispatches, fetch last)
    res = icp.align(l_layers, g_layers, guess, params)
    _ = float(res.optimal_tf.t[0])
    n_align = 20
    t0 = time.perf_counter()
    for _ in range(n_align):
        res = icp.align(l_layers, g_layers, guess, params)
    _ = float(res.optimal_tf.t[0])
    dt = time.perf_counter() - t0
    timings["full_align"] = dt / n_align * 1e3
    print(f"{'full_align':16s} {timings['full_align']:8.3f} ms "
          f"({n_align / dt:.1f} aligns/s, iters={int(res.n_iterations)})",
          flush=True)

    print(json.dumps({k: round(v, 4) for k, v in timings.items()}))


if __name__ == "__main__":
    main()
