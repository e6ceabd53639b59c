"""kitti-odometry — scan-to-scan LiDAR odometry over a KITTI sequence.

Replaces the reference's batch procedure (scripts/kitti-run-seq.py drives
``icp-run`` once per consecutive scan pair with demos/icp-settings-kitti.yaml)
with an in-process driver: scans stream through the decimation pipeline and
the fused ICP program; consecutive relative poses chain into a trajectory
(constant-velocity initial guess), optionally evaluated against ground truth
(ATE/RPE) and saved in KITTI pose format.

Usage:
  python -m mp2p_icp_tpu.apps.kitti_odometry \
      --bin-dir KITTI/sequences/00/velodyne -c icp-settings-kitti.yaml \
      [--gt-poses 00.txt] [--max-frames N] [--out-poses est.txt]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time


def run_sequence(
    scan_paths,
    config_path: str,
    gt_poses=None,
    max_frames=None,
    verbose=True,
    batch_size: int = 0,
):
    """``batch_size > 0`` switches to the TPU deployment shape: consecutive
    pairs register as vmapped batches of B through one XLA program
    (parallel.batch). Pairs within a batch are data-parallel; the
    constant-velocity model survives at batch granularity — every pair in
    batch k is seeded with batch k-1's last relative pose (one host fetch
    per batch, amortised over B pairs). This is the batched-odometry path
    bench.py measures; the sequential mode mirrors the reference's
    scripts/kitti-run-seq.py icp-run-per-pair procedure."""
    import numpy as np

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.core.pointcloud import round_capacity
    from mp2p_icp_tpu.eval.trajectory import ate_rmse, poses_from_se3, rpe
    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.io.kitti import load_kitti_bin
    from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

    icp, params, sections = load_icp_config_file(config_path)
    filters = sections.get("filters", [])

    if max_frames:
        scan_paths = scan_paths[:max_frames]

    # ONE fixed capacity across the whole sequence for jit stability,
    # sized from the LARGEST scan (a KITTI .bin is 16 bytes/point, so one
    # cheap stat pass suffices) — sizing from the first scan crashed with
    # 'capacity < point count' the first time a later scan crossed its
    # power-of-two bucket, hours into a sequence
    import os as _os

    max_pts = max(_os.path.getsize(str(p)) // 16 for p in scan_paths)
    cap = round_capacity(max(int(max_pts), 1))

    def prep(path):
        pc = load_kitti_bin(str(path), capacity=cap)
        layers = apply_filter_pipeline(filters, {"raw": pc})
        return layers

    t_align = 0.0
    n_align = 0

    if batch_size > 0:
        from mp2p_icp_tpu.parallel.batch import (
            make_batched_align,
            stack_pytrees,
        )

        import jax.numpy as jnp

        B = batch_size
        fb = make_batched_align(icp, params)
        ident = se3.identity()
        rel_Rs, rel_ts = [], []
        n_pairs = len(scan_paths) - 1
        # sliding prep window: frame i is the local of pair i-1 and the
        # global of pair i, so only [s, s+B] frames need be device-resident
        # at once — a KITTI-length sequence must NOT hold all ~4.5k prepped
        # scans (plus every batch's full ICPResults) in HBM.
        window = {}

        def frame(i):
            if i not in window:
                window[i] = prep(scan_paths[i])
            return window[i]

        t0 = time.perf_counter()
        guess_pose = ident  # batch-granular constant-velocity seed
        for s in range(0, n_pairs, B):
            idx = list(range(s, min(s + B, n_pairs)))
            pad = idx + [idx[-1]] * (B - len(idx))  # static batch shape
            l_b = stack_pytrees([frame(i + 1) for i in pad])
            g_b = stack_pytrees([frame(i) for i in pad])
            u_b = stack_pytrees([guess_pose] * B)
            rb = fb(l_b, g_b, u_b)
            # ONE host fetch per batch (the only true sync on the axon
            # platform): keep just the B relative poses on host and drop
            # the ICPResults (its final_pairings block is tens of MB);
            # the last pose doubles as the next batch's velocity seed
            R_np = np.asarray(rb.optimal_tf.R)
            t_np = np.asarray(rb.optimal_tf.t)
            del rb
            rel_Rs.append(R_np[: len(idx)])
            rel_ts.append(t_np[: len(idx)])
            k_last = len(idx) - 1
            guess_pose = se3.Pose(
                jnp.asarray(R_np[k_last]), jnp.asarray(t_np[k_last])
            )
            for i in list(window):  # evict frames behind the window
                if i <= s + B - 1:
                    del window[i]
        t_align = time.perf_counter() - t0
        n_align = n_pairs
        traj = [ident]
        for R, t in zip(rel_Rs, rel_ts):
            for k in range(R.shape[0]):
                rel = se3.Pose(jnp.asarray(R[k]), jnp.asarray(t[k]))
                traj.append(se3.compose(traj[-1], rel))
        if verbose:
            print(
                f"[kitti-odometry] batched B={B}: "
                f"{n_align / max(t_align, 1e-9):.2f} scans/s",
                flush=True,
            )
    else:
        traj = [se3.identity()]
        rel_prev = se3.identity()
        prev_layers = prep(scan_paths[0])
        t0 = time.perf_counter()

        for i, path in enumerate(scan_paths[1:], start=1):
            cur_layers = prep(path)
            guess = rel_prev  # constant-velocity model
            res = icp.align(cur_layers, prev_layers, guess, params)
            rel = res.optimal_tf
            # the seed and the trajectory chain stay ON DEVICE — a host
            # fetch here would add the ~25 ms tunnel round trip to EVERY
            # align (the constant-velocity model needs only device-to-
            # device chaining); fetch occasionally for progress/backpressure
            traj.append(se3.compose(traj[-1], rel))
            rel_prev = rel
            prev_layers = cur_layers
            n_align += 1
            if i % 50 == 0:
                # host fetch = true sync (jax.block_until_ready does not
                # block through the axon tunnel); bounds all enqueued work
                _ = float(rel.t[0])
                if verbose:
                    print(
                        f"[kitti-odometry] {i}/{len(scan_paths) - 1} "
                        f"({n_align / max(time.perf_counter() - t0, 1e-9):.2f}"
                        " scans/s)",
                        flush=True,
                    )
        # final true sync before closing the timing window
        _ = float(traj[-1].t[0])
        t_align = time.perf_counter() - t0

    est = poses_from_se3(traj)
    out = {
        "poses": est,
        "scans_per_s": n_align / max(t_align, 1e-9),
        "n_frames": len(traj),
    }
    if gt_poses is not None:
        gt = np.asarray(gt_poses)[: len(est)]
        out["ate_rmse"] = ate_rmse(est, gt)
        out["rpe_trans"], out["rpe_rot"] = rpe(est, gt)
    return out


def run_sequence_mapping(
    scan_paths,
    config_path: str,
    gt_poses=None,
    max_frames=None,
    map_layer: str = "map",
    map_capacity: int = 1 << 20,
    map_voxel: float = 0.5,
    merge_every: int = 1,
    loop_closure: bool = False,
    loop_min_gap: int = 20,
    loop_max_distance: float = 5.0,
    verbose=True,
):
    """Scan-to-ACCUMULATED-MAP odometry (the mola_lidar_odometry loop):
    per frame the YAML's filter pipeline runs, the result registers
    against the rolling on-device map and merges into it — one fused
    dispatch per frame (mp2p_icp_tpu.odometry.OdometryMapper). The
    config's matchers are re-pointed at ``map_layer`` on the global
    side; a FilterDecimateVoxels(map_voxel) maintains the map."""
    import dataclasses as _dc
    import os as _os

    import numpy as np

    from mp2p_icp_tpu.core.pointcloud import round_capacity
    from mp2p_icp_tpu.eval.trajectory import ate_rmse, rpe
    from mp2p_icp_tpu.filters import apply_filter_pipeline  # noqa: F401
    from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels
    from mp2p_icp_tpu.io.kitti import load_kitti_bin
    from mp2p_icp_tpu.odometry import OdometryMapper
    from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

    icp, params, sections = load_icp_config_file(config_path)
    filters = sections.get("filters", [])
    if max_frames:
        scan_paths = scan_paths[:max_frames]
    max_pts = max(_os.path.getsize(str(p)) // 16 for p in scan_paths)
    cap = round_capacity(max(int(max_pts), 1))

    # the matchers' LOCAL layer names stay as configured; the GLOBAL side
    # becomes the rolling map layer
    local_layer = icp.matchers[0].layer_matches[0].local_layer
    icp.matchers = [
        _dc.replace(
            m,
            layer_matches=tuple(
                _dc.replace(lm, global_layer=map_layer)
                for lm in m.layer_matches
            ),
        )
        for m in icp.matchers
    ]

    mapper = OdometryMapper(
        icp=icp, params=params, filters=filters,
        local_layer=local_layer, map_layer=map_layer,
        map_capacity=map_capacity, merge_every=merge_every,
        map_filters=[FilterDecimateVoxels(
            input_pointcloud_layer=(map_layer,),
            output_pointcloud_layer=map_layer,
            voxel_filter_resolution=map_voxel,
            output_capacity=map_capacity,
        )],
    )
    frames = [
        {"raw": load_kitti_bin(str(p), capacity=cap)} for p in scan_paths
    ]
    out = mapper.run(frames, progress_every=50 if verbose else 0)
    out["n_frames"] = len(frames)

    if loop_closure:
        # revisit detection + ICP-verified loop edges + pose-graph GN
        # (loop_closure.py; promotes parallel/pose_graph.py to a pipeline
        # feature). Scan-to-scan closure aligns use the config's ORIGINAL
        # matcher layer topology, so reload it.
        from mp2p_icp_tpu.loop_closure import close_and_optimize

        icp_lc, params_lc, _ = load_icp_config_file(config_path)
        cands_needed = {}

        def cloud_of(k):
            if k not in cands_needed:
                layers = apply_filter_pipeline(
                    tuple(filters), dict(frames[k]), None
                )
                cands_needed[k] = layers[local_layer]
            return cands_needed[k]

        class _Lazy:
            def __getitem__(self, k):
                return cloud_of(k)

        g_layer = icp_lc.matchers[0].layer_matches[0].global_layer
        lc = close_and_optimize(
            icp_lc, params_lc, _Lazy(), out["poses"],
            min_frame_gap=loop_min_gap,
            max_distance=loop_max_distance,
            layer=g_layer,
        )
        if verbose:
            print(
                f"[loop-closure] candidates={lc['n_candidates']} "
                f"accepted={lc['n_accepted']}"
            )
        out["poses_odometry"] = out["poses"]
        out["poses"] = lc["poses"]
        out["loop_closures"] = lc["loops"]

    if gt_poses is not None:
        gt = np.asarray(gt_poses)[: out["poses"].shape[0]]
        out["ate_rmse"] = ate_rmse(out["poses"], gt)
        out["rpe_trans"], out["rpe_rot"] = rpe(out["poses"], gt)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kitti-odometry")
    ap.add_argument("--bin-dir", required=True)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--gt-poses", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out-poses", default=None)
    ap.add_argument("-B", "--batch-size", type=int, default=0,
                    help="register consecutive pairs in vmapped batches of "
                         "B instead of sequentially; every pair in a batch "
                         "is seeded with the previous batch's last relative "
                         "pose (batch-granular constant velocity)")
    ap.add_argument("--mapping", action="store_true",
                    help="scan-to-ACCUMULATED-MAP odometry with a rolling "
                         "on-device map (one fused dispatch per frame) "
                         "instead of scan-to-scan pairs")
    ap.add_argument("--map-voxel", type=float, default=0.5,
                    help="map-maintenance voxel size [m] (mapping mode)")
    ap.add_argument("--map-capacity", type=int, default=1 << 20)
    ap.add_argument("--merge-every", type=int, default=1,
                    help="merge every k-th frame into the map (keyframing)")
    ap.add_argument("--out-map", default=None,
                    help="save the final map as .mm.npz (mapping mode)")
    ap.add_argument("--loop-closure", action="store_true",
                    help="after the mapping run: revisit detection + "
                         "ICP-verified loop edges + pose-graph GN over "
                         "the trajectory (mapping mode)")
    ap.add_argument("--loop-min-gap", type=int, default=20,
                    help="minimum frame separation for a loop candidate")
    ap.add_argument("--loop-max-distance", type=float, default=5.0,
                    help="maximum revisit distance [m] for a candidate")
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.eval.trajectory import load_kitti_poses, save_kitti_poses

    paths = sorted(pathlib.Path(args.bin_dir).glob("*.bin"))
    if not paths:
        raise SystemExit(f"error: no .bin scans in {args.bin_dir}")
    gt = load_kitti_poses(args.gt_poses) if args.gt_poses else None
    if args.mapping:
        out = run_sequence_mapping(
            paths, args.config, gt_poses=gt, max_frames=args.max_frames,
            map_capacity=args.map_capacity, map_voxel=args.map_voxel,
            merge_every=args.merge_every,
            loop_closure=args.loop_closure,
            loop_min_gap=args.loop_min_gap,
            loop_max_distance=args.loop_max_distance,
        )
        if args.out_map:
            from mp2p_icp_tpu.core.metric_map import MetricMap
            from mp2p_icp_tpu.io.mm import save_mm_file

            save_mm_file(
                args.out_map, MetricMap(layers={"map": out["map"]})
            )
            print(f"map saved to {args.out_map} "
                  f"({int(out['map'].count)} points)")
    else:
        out = run_sequence(
            paths, args.config, gt_poses=gt, max_frames=args.max_frames,
            batch_size=args.batch_size,
        )
    print(
        f"frames={out['n_frames']} scans/s={out['scans_per_s']:.2f}"
        + (
            f" ATE={out['ate_rmse']:.3f}m RPE={out['rpe_trans']:.3f}m/"
            f"{out['rpe_rot']:.4f}rad"
            if "ate_rmse" in out
            else ""
        )
    )
    if args.out_poses:
        save_kitti_poses(args.out_poses, out["poses"])
        print(f"poses saved to {args.out_poses}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
