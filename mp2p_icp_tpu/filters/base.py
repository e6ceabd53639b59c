"""Filter pipeline base machinery.

Reference parity: mp2p_icp_filters/include/mp2p_icp_filters/FilterBase.h:53-103
— ``FilterBase::filter(metric_map_t&)`` + ``apply_filter_pipeline()`` running
filters in definition order.

TPU-first: a filter is a frozen config whose ``__call__`` maps a layers dict
(pytree) to a new layers dict — pure and jittable where the layer set is
static. The pipeline is plain composition; ``apply_filter_pipeline`` also
accepts a host-side MetricMap for app-level use.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable

from mp2p_icp_tpu.core.metric_map import MetricMap
from mp2p_icp_tpu.core.pointcloud import PointCloud


@dataclasses.dataclass(frozen=True)
class FilterBase:
    """Base for all filters. Subclasses implement __call__(layers) -> layers."""

    def __call__(self, layers: Dict[str, PointCloud], variables=None):
        raise NotImplementedError


def apply_filter_pipeline(filters: Iterable[FilterBase], mm, variables=None):
    """Run filters in order (reference: FilterBase.cpp:33-98). Accepts a
    MetricMap (mutated in place, host convenience) or a layers dict
    (returns a new dict, jit-friendly)."""
    if isinstance(mm, MetricMap):
        layers = dict(mm.layers)
        for f in filters:
            layers = f(layers, variables)
        # feature filters (FilterEdgesPlanes) emit extracted planes under the
        # reserved '_planes' key; surface them as MetricMap.planes
        planes = layers.pop("_planes", None)
        if planes is not None:
            mm.planes = planes
        mm.layers = layers
        return mm
    layers = dict(mm)
    for f in filters:
        layers = f(layers, variables)
    return layers
