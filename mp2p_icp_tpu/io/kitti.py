"""KITTI odometry .bin reader/writer.

Reference parity: apps/kitti2mm/main.cpp:46-77 — KITTI velodyne .bin files
are flat float32 [N, 4] (x, y, z, intensity).
"""

from __future__ import annotations

import numpy as np

from mp2p_icp_tpu.core.pointcloud import PointCloud


def load_kitti_bin(path: str, capacity: int | None = None) -> PointCloud:
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return PointCloud.from_numpy(
        raw[:, :3], capacity=capacity, intensity=raw[:, 3]
    )


def save_kitti_bin(path: str, pc: PointCloud) -> None:
    n = int(pc.count)
    out = np.zeros((n, 4), np.float32)
    out[:, :3] = pc.to_numpy()
    if pc.intensity is not None:
        out[:, 3] = np.asarray(pc.intensity[:n])
    out.tofile(path)
