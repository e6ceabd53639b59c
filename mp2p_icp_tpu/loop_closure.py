"""Loop closure: revisit detection + ICP verification + pose-graph fix.

Greenfield vs the reference (mp2p_icp provides the registration and the
pose-graph building blocks; loop closure itself lives upstream in MOLA).
This module promotes `parallel/pose_graph.py` from library code to a
pipeline feature (VERDICT r4 Next #10):

1. `propose_loop_candidates` — geometric revisit test on the estimated
   trajectory: frame pairs far apart in TIME but close in SPACE.
2. `close_loops` — each candidate pair is re-registered scan-to-scan
   with the fused ICP align (guess = estimated relative pose); low
   quality or large correction rejects the candidate.
3. `optimize_trajectory` — odometry edges + accepted loop edges into the
   batched GN pose-graph (`optimize_pose_graph`), returning the
   corrected trajectory.

All aligns are the same fused one-dispatch programs the odometry loop
uses; the pose graph is one jitted GN solve.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.core.se3 import Pose
from mp2p_icp_tpu.parallel.pose_graph import (
    PoseGraphEdges,
    PoseGraphParams,
    optimize_pose_graph,
)


def propose_loop_candidates(
    poses: np.ndarray,
    min_frame_gap: int = 10,
    max_distance: float = 3.0,
    stride: int = 1,
    max_candidates: int = 32,
) -> List[Tuple[int, int]]:
    """Revisit test: (i, j) with j - i >= min_frame_gap and
    |t_i - t_j| <= max_distance, greedily thinned so no frame appears in
    more than one candidate (closest-first)."""
    t = np.asarray(poses)[:, :3, 3]
    n = t.shape[0]
    cands = []
    for j in range(0, n, stride):
        for i in range(0, j - min_frame_gap, stride):
            d = float(np.linalg.norm(t[i] - t[j]))
            if d <= max_distance:
                cands.append((d, i, j))
    cands.sort()
    used = set()
    out = []
    for d, i, j in cands:
        if i in used or j in used:
            continue
        out.append((i, j))
        used.add(i)
        used.add(j)
        if len(out) >= max_candidates:
            break
    return out


def close_loops(
    icp,
    params,
    local_clouds: Sequence[PointCloud],
    poses: np.ndarray,
    candidates: Sequence[Tuple[int, int]],
    layer: str = "raw",
    min_quality: float = 0.5,
    max_correction: float = 5.0,
) -> List[Tuple[int, int, Pose, float]]:
    """Verify candidates by scan-to-scan registration: align cloud_j onto
    cloud_i with guess = T_i^-1 T_j (from the drifting odometry). Returns
    accepted (i, j, Z_ij, quality) loop measurements."""
    accepted = []
    for i, j in candidates:
        Ti = Pose(jnp.asarray(poses[i, :3, :3], jnp.float32),
                  jnp.asarray(poses[i, :3, 3], jnp.float32))
        Tj = Pose(jnp.asarray(poses[j, :3, :3], jnp.float32),
                  jnp.asarray(poses[j, :3, 3], jnp.float32))
        guess = se3.compose(se3.inverse(Ti), Tj)
        res = icp.align(
            {layer: local_clouds[j]}, {layer: local_clouds[i]},
            guess, params,
        )
        q = float(res.quality)
        corr = float(
            jnp.linalg.norm(res.optimal_tf.t - guess.t)
        )
        if q >= min_quality and corr <= max_correction:
            accepted.append((i, j, res.optimal_tf, q))
    return accepted


def optimize_trajectory(
    poses: np.ndarray,
    loops: Sequence[Tuple[int, int, Pose, float]],
    odom_information: float = 1.0,
    loop_information: float = 10.0,
    gn_params: Optional[PoseGraphParams] = None,
) -> np.ndarray:
    """Pose-graph GN over odometry edges (consecutive estimated relative
    poses) + accepted loop edges. Node 0 is gauge-fixed by the solver's
    gauge prior. Returns the corrected [N, 4, 4] trajectory."""
    n = poses.shape[0]
    if not loops:
        return np.asarray(poses)
    node_poses = Pose(
        jnp.asarray(poses[:, :3, :3], jnp.float32),
        jnp.asarray(poses[:, :3, 3], jnp.float32),
    )
    ii, jj, zs_R, zs_t, infos = [], [], [], [], []
    for k in range(n - 1):
        rel = se3.compose(
            se3.inverse(Pose(node_poses.R[k], node_poses.t[k])),
            Pose(node_poses.R[k + 1], node_poses.t[k + 1]),
        )
        ii.append(k)
        jj.append(k + 1)
        zs_R.append(rel.R)
        zs_t.append(rel.t)
        infos.append(np.eye(6, dtype=np.float32) * odom_information)
    for i, j, z, q in loops:
        ii.append(i)
        jj.append(j)
        zs_R.append(z.R)
        zs_t.append(z.t)
        infos.append(np.eye(6, dtype=np.float32) * (loop_information * q))
    edges = PoseGraphEdges(
        i=jnp.asarray(ii, jnp.int32),
        j=jnp.asarray(jj, jnp.int32),
        z=Pose(jnp.stack(zs_R), jnp.stack(zs_t)),
        information=jnp.asarray(np.stack(infos)),
        valid=jnp.ones((len(ii),), bool),
    )
    opt, _chi2 = optimize_pose_graph(
        node_poses, edges, gn_params or PoseGraphParams(max_iterations=15)
    )
    out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    out[:, :3, :3] = np.asarray(opt.R)
    out[:, :3, 3] = np.asarray(opt.t)
    # re-anchor at the original first pose (the gauge prior holds node 0
    # near its initial value; make it exact)
    fix = poses[0] @ np.linalg.inv(out[0])
    return np.einsum("ab,nbc->nac", fix, out)


def close_and_optimize(
    icp,
    params,
    local_clouds: Sequence[PointCloud],
    poses: np.ndarray,
    min_frame_gap: int = 10,
    max_distance: float = 3.0,
    layer: str = "raw",
    min_quality: float = 0.5,
) -> Dict:
    """The full driver: propose -> verify -> optimize. Returns
    {"poses", "n_candidates", "n_accepted", "loops"}."""
    cands = propose_loop_candidates(
        poses, min_frame_gap=min_frame_gap, max_distance=max_distance
    )
    loops = close_loops(
        icp, params, local_clouds, poses, cands,
        layer=layer, min_quality=min_quality,
    )
    new_poses = optimize_trajectory(poses, loops)
    return {
        "poses": new_poses,
        "n_candidates": len(cands),
        "n_accepted": len(loops),
        "loops": [(i, j, float(q)) for i, j, _z, q in loops],
    }
