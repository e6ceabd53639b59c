from mp2p_icp_tpu.quality.paired_ratio import QualityPairedRatio  # noqa: F401
from mp2p_icp_tpu.quality.voxels import QualityVoxels  # noqa: F401
from mp2p_icp_tpu.quality.range_image import QualityRangeImageSimilarity  # noqa: F401
