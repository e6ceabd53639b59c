from mp2p_icp_tpu.filters.base import FilterBase, apply_filter_pipeline  # noqa: F401
from mp2p_icp_tpu.filters.decimate_voxels import (  # noqa: F401
    DecimateMethod,
    FilterDecimateVoxels,
)
from mp2p_icp_tpu.filters.by_range import FilterByRange  # noqa: F401
from mp2p_icp_tpu.filters.bounding_box import FilterBoundingBox  # noqa: F401
from mp2p_icp_tpu.filters.by_ring import FilterByRing  # noqa: F401
from mp2p_icp_tpu.filters.by_intensity import (  # noqa: F401
    FilterByIntensity,
    FilterNormalizeIntensity,
)
from mp2p_icp_tpu.filters.deskew import FilterDeskew  # noqa: F401
from mp2p_icp_tpu.filters.adjust_timestamps import (  # noqa: F401
    FilterAdjustTimestamps,
    TimestampAdjustMethod,
)
from mp2p_icp_tpu.filters.merge import FilterMerge  # noqa: F401
from mp2p_icp_tpu.filters.estimate_normals import (  # noqa: F401
    FilterEstimateNormals,
)
from mp2p_icp_tpu.filters.delete_layer import FilterDeleteLayer  # noqa: F401
