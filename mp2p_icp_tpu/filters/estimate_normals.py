"""Normal-estimation filter: attach per-point normals to a layer.

Pipeline form of ops/normals.estimate_point_normals — the plane-capable-
map preparation step (reference: NearestPlaneCapable maps precompute
plane fits at insertion, mola_metric_maps NDT; consumed by
Matcher_Point2Plane, mp2p_icp/src/Matcher_Point2Plane.cpp:41-114 via
``use_point_normals=True``). Typical LiDAR-odometry placement: after
FilterDecimateVoxels on the per-frame local layer, so the kNN fit runs
once per frame instead of once per ICP iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.base import FilterBase
from mp2p_icp_tpu.ops.normals import estimate_point_normals


@dataclasses.dataclass(frozen=True)
class FilterEstimateNormals(FilterBase):
    input_pointcloud_layer: str = "decimated"
    # in-place by default (normals ride the same layer)
    output_pointcloud_layer: str = ""
    # optional denser layer to take neighbourhoods from (e.g. the
    # pre-decimation deskewed sweep) — better fits than the decimated
    # cloud's self-neighbourhoods
    source_pointcloud_layer: str = ""
    knn: int = 8
    max_radius: float = 2.0
    plane_eigen_threshold: float = 1e-2
    min_points_to_fit: int = 4

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        pc = layers[self.input_pointcloud_layer]
        out = estimate_point_normals(
            pc,
            knn=self.knn,
            max_radius=self.max_radius,
            plane_eigen_threshold=self.plane_eigen_threshold,
            min_points_to_fit=self.min_points_to_fit,
            source=(
                layers[self.source_pointcloud_layer]
                if self.source_pointcloud_layer else None
            ),
        )
        new_layers = dict(layers)
        target = self.output_pointcloud_layer or self.input_pointcloud_layer
        new_layers[target] = out
        return new_layers
