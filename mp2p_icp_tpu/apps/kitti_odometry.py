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
):
    import jax
    import numpy as np

    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.core.pointcloud import PointCloud, round_capacity
    from mp2p_icp_tpu.eval.trajectory import ate_rmse, poses_from_se3, rpe
    from mp2p_icp_tpu.filters import apply_filter_pipeline
    from mp2p_icp_tpu.io.kitti import load_kitti_bin
    from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file

    icp, params, sections = load_icp_config_file(config_path)
    filters = sections.get("filters", [])

    if max_frames:
        scan_paths = scan_paths[:max_frames]

    # fixed capacity across the sequence for jit stability
    first = load_kitti_bin(str(scan_paths[0]))
    cap = first.capacity

    def prep(path):
        pc = load_kitti_bin(str(path), capacity=cap)
        layers = apply_filter_pipeline(filters, {"raw": pc})
        return layers

    traj = [se3.identity()]
    rel_prev = se3.identity()
    prev_layers = prep(scan_paths[0])
    t_align = 0.0
    n_align = 0

    for i, path in enumerate(scan_paths[1:], start=1):
        cur_layers = prep(path)
        guess = rel_prev  # constant-velocity model
        t0 = time.perf_counter()
        res = icp.align(cur_layers, prev_layers, guess, params)
        jax.block_until_ready(res.optimal_tf.t)
        t_align += time.perf_counter() - t0
        n_align += 1
        rel = res.optimal_tf
        traj.append(se3.compose(traj[-1], rel))
        rel_prev = rel
        prev_layers = cur_layers
        if verbose and i % 50 == 0:
            print(
                f"[kitti-odometry] {i}/{len(scan_paths) - 1} "
                f"({n_align / max(t_align, 1e-9):.2f} scans/s)",
                flush=True,
            )

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


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kitti-odometry")
    ap.add_argument("--bin-dir", required=True)
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--gt-poses", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out-poses", default=None)
    args = ap.parse_args(argv)

    from mp2p_icp_tpu.eval.trajectory import load_kitti_poses, save_kitti_poses

    paths = sorted(pathlib.Path(args.bin_dir).glob("*.bin"))
    if not paths:
        raise SystemExit(f"error: no .bin scans in {args.bin_dir}")
    gt = load_kitti_poses(args.gt_poses) if args.gt_poses else None
    out = run_sequence(
        paths, args.config, gt_poses=gt, max_frames=args.max_frames
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
