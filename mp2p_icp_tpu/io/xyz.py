"""ASCII .xyz point-cloud IO (optionally gzipped).

Reference parity: mp2p_icp_map/src/load_xyz_file.cpp:29-67 — Nx3 ASCII
(whitespace separated), transparent .gz support.
"""

from __future__ import annotations

import gzip
import io as _io

import numpy as np

from mp2p_icp_tpu.core.pointcloud import PointCloud


def load_xyz_file(path: str, decimation: int = 1) -> PointCloud:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt") as f:
        xyz = np.loadtxt(_io.StringIO(f.read()), dtype=np.float32)
    xyz = xyz.reshape(-1, xyz.shape[-1])[:, :3]
    if decimation > 1:
        xyz = xyz[::decimation]
    return PointCloud.from_numpy(np.ascontiguousarray(xyz))


def save_xyz_file(path: str, pc: PointCloud) -> None:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        np.savetxt(f, pc.to_numpy(), fmt="%.6f")
