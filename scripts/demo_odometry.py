"""End-to-end demo: spinning-LiDAR odometry -> interactive HTML map.

Runs the fused map-building odometry loop (mp2p_icp_tpu.odometry) over a
synthetic spinning-scanner street sequence (eval/lidar_sim) and exports
the final map + estimated trajectory as ONE standalone interactive WebGL
.html (apps/html_viewer) — open it in any browser.

    python scripts/demo_odometry.py [out.html] [--frames N] [--cpu]

Representative of the full stack: deskew (IMU-grade twists) -> voxel
decimation -> scan-to-accumulated-map point-to-plane align -> FilterMerge
+ map maintenance, one fused dispatch per frame.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="odometry_demo.html")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: whatever JAX has)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from mp2p_icp_tpu.apps.html_viewer import export_map_html
    from mp2p_icp_tpu.core import se3
    from mp2p_icp_tpu.core.metric_map import MetricMap
    from mp2p_icp_tpu.eval.lidar_sim import (
        make_street_scene,
        render_spinning_scan,
        scan_to_pointcloud,
    )
    from mp2p_icp_tpu.eval.trajectory import ate_rmse
    from mp2p_icp_tpu.filters.decimate_voxels import FilterDecimateVoxels
    from mp2p_icp_tpu.filters.deskew import FilterDeskew
    from mp2p_icp_tpu.icp import ICP, ICPParameters
    from mp2p_icp_tpu.matchers.base import LayerMatch
    from mp2p_icp_tpu.matchers.point2plane import MatcherPoint2Plane
    from mp2p_icp_tpu.odometry import OdometryMapper
    from mp2p_icp_tpu.solvers.gauss_newton import GNParams
    from mp2p_icp_tpu.solvers.solver import SolverGaussNewton

    n = args.frames
    dt = 0.1
    rng = np.random.RandomState(7)
    scene = make_street_scene(rng, length=200.0, n_pillars=50)
    print(f"rendering {n} spinning sweeps...", flush=True)
    poses, twists, frames = [], [], []
    for i in range(n):
        poses.append(se3.from_xyz_ypr(
            12.0 + 8.0 * dt * i, 0.5 * np.sin(0.15 * i), 1.7,
            0.05 * np.sin(0.2 * i), 0.0, 0.0,
        ))
    for i in range(n):
        j = min(i + 1, n - 1)
        rel = se3.compose(se3.inverse(poses[i]), poses[j])
        tw = (np.asarray(se3.log(rel), np.float64) / dt
              if i < n - 1 else twists[-1])
        twists.append(np.asarray(
            tw * (1 + 0.03 * rng.randn(6)), np.float32))
        scan = render_spinning_scan(
            scene, poses[i], twists[i], rng, n_rings=32, n_azimuth=768,
        )
        frames.append({"raw": scan_to_pointcloud(scan, capacity=1 << 16)})

    mapper = OdometryMapper(
        icp=ICP(
            matchers=[MatcherPoint2Plane(
                distance_threshold=1.5, knn=6,
                layer_matches=(LayerMatch(
                    global_layer="map", local_layer="decimated"),),
            )],
            solvers=[SolverGaussNewton(
                gn_params=GNParams(max_iterations=3))],
        ),
        params=ICPParameters(
            max_iterations=30, crop_capacity=1 << 14, crop_extra_margin=3.0,
        ),
        filters=[
            FilterDeskew(input_pointcloud_layer="raw",
                         output_pointcloud_layer="deskewed"),
            FilterDecimateVoxels(
                input_pointcloud_layer=("deskewed",),
                output_pointcloud_layer="decimated",
                voxel_filter_resolution=0.5, output_capacity=6144,
            ),
        ],
        map_filters=[FilterDecimateVoxels(
            input_pointcloud_layer=("map",),
            output_pointcloud_layer="map",
            voxel_filter_resolution=0.5, output_capacity=1 << 15,
        )],
        map_capacity=1 << 15,
    )
    p0 = poses[0]
    print("running the fused odometry loop (first frame compiles)...",
          flush=True)
    t0 = time.perf_counter()
    out = mapper.run(frames, twists=twists, dt=dt, initial_pose=p0)
    gt = np.tile(np.eye(4), (n, 1, 1))
    for i, p in enumerate(poses):
        gt[i, :3, :3] = np.asarray(p.R)
        gt[i, :3, 3] = np.asarray(p.t)
    ate = ate_rmse(out["poses"], gt)
    print(
        f"{n} frames in {time.perf_counter() - t0:.1f}s "
        f"({out['scans_per_s']:.1f} scans/s steady), ATE {ate:.3f} m, "
        f"map {int(out['map'].count)} points",
        flush=True,
    )
    mm = MetricMap(layers={"map": out["map"]})
    export_map_html(
        mm, args.out,
        trajectory=out["poses"][:, :3, 3],
        title=f"odometry demo — {n} frames, ATE {ate:.3f} m",
    )
    print(f"wrote {args.out} — open in any browser")
    return 0


if __name__ == "__main__":
    sys.exit(main())
