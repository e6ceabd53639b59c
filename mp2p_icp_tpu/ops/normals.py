"""Per-point normal estimation — plane-capable point maps.

The reference's Matcher_Point2Plane asks the MAP for the nearest plane
(NearestPlaneCapable, mp2p_icp/src/Matcher_Point2Plane.cpp:41-114); the
plane-capable map classes (NDT / voxel-with-normals in mola_metric_maps)
precompute per-cell plane fits at insertion time. This module is the TPU
analogue for plain point layers: fit a normal per point ONCE (from its
kNN neighbourhood, closed-form 3x3 eigendecomposition) and store it on
the cloud's ``normals`` channel, so registration iterations only gather
— the k-NN plane fit leaves the per-iteration hot loop.

Normals are zero where the neighbourhood is not plane-like (the same
lambda0 < eigen_threshold * lambda2 criterion the matchers use), which
downstream matchers treat as "no plane here".
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.ops.eigen import estimate_points_eigen
from mp2p_icp_tpu.ops.nn_bruteforce import knn_bruteforce


def estimate_point_normals(
    pc: PointCloud,
    knn: int = 8,
    max_radius: float = 2.0,
    plane_eigen_threshold: float = 1e-2,
    min_points_to_fit: int = 4,
    source: PointCloud = None,
    source_valid=None,
) -> PointCloud:
    """Return `pc` with a ``normals`` channel fitted from each point's
    kNN neighbourhood. Non-planar / under-populated neighbourhoods get a
    zero normal.

    source: optional DENSER cloud to take neighbourhoods from (e.g. the
    pre-decimation deskewed sweep while `pc` is the decimated layer) —
    markedly better fits than self-neighbourhoods of a 0.5 m-decimated
    cloud (measured: odometry ATE 0.061 self vs 0.017 per-iteration fits
    on the street sequence)."""
    src = source if source is not None else pc
    valid = pc.valid_mask()
    sv = source_valid if source_valid is not None else src.valid_mask()
    res = knn_bruteforce(
        pc.xyz, valid, src.xyz, sv, k=knn,
        max_radius_sq=max_radius * max_radius,
    )
    neigh = src.xyz[jnp.clip(res.idx, 0, src.capacity - 1)]
    pe = estimate_points_eigen(neigh, res.valid)
    enough = pe.count >= min_points_to_fit
    l0, l2 = pe.eigenvalues[:, 0], pe.eigenvalues[:, 2]
    is_plane = l0 < plane_eigen_threshold * l2
    keep = valid & enough & is_plane
    normals = jnp.where(keep[:, None], pe.eigenvectors[:, :, 0], 0.0)
    return dataclasses.replace(pc, normals=normals)
