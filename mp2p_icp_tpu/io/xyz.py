"""ASCII .xyz point-cloud IO (optionally gzipped).

Reference parity: mp2p_icp_map/src/load_xyz_file.cpp:29-67 — Nx3 ASCII
(whitespace separated), transparent .gz support.
"""

from __future__ import annotations

import gzip

import numpy as np

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.io.native import parse_float_table


def load_xyz_file(path: str, decimation: int = 1) -> PointCloud:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        xyz = parse_float_table(f.read())
    xyz = xyz.reshape(-1, xyz.shape[-1])[:, :3]
    if decimation > 1:
        xyz = xyz[::decimation]
    return PointCloud.from_numpy(np.ascontiguousarray(xyz))


def save_xyz_file(path: str, pc: PointCloud) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        np.savetxt(f, pc.to_numpy(), fmt="%.6f")
