"""mp2p_icp_tpu — a TPU-native multi-primitive-to-primitive (MP2P) ICP and
point-cloud pipeline framework.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the
capabilities of MOLAorg/mp2p_icp (reference layout: mp2p_icp_map /
mp2p_icp / mp2p_icp_filters / apps — see SURVEY.md):

- ``core``     : SE(3) Lie math, padded SoA point clouds, layered metric maps,
                 pairings, dynamic parameters (reference: mp2p_icp_map/).
- ``ops``      : grid-hash nearest-neighbour search, masked eigen estimation,
                 voxelisation primitives (reference: nanoflann KD-trees +
                 PointCloudToVoxelGrid — re-designed as TPU-friendly
                 sort/gather + Pallas kernels).
- ``solvers``  : Horn, OLAE, Gauss-Newton optimal-transform kernels over all
                 five pairing types (reference: mp2p_icp/src/optimal_tf_*.cpp).
- ``matchers`` : data-association modules (reference: mp2p_icp/src/Matcher*).
- ``quality``  : registration quality evaluators.
- ``filters``  : point-cloud filter/generator pipeline
                 (reference: mp2p_icp_filters/).
- ``pipeline`` : YAML pipeline configuration & module registry.
- ``io``       : .xyz/.mm/KITTI readers-writers.
- ``parallel`` : device-mesh sharding of batched registrations and map shards.
"""

__version__ = "0.1.0"

import jax as _jax

# Pose/solver math is tiny (3x3 / 4x4 / 6x6) but accuracy-critical: on TPU the
# MXU would otherwise run f32 matmuls as bf16 passes (~1e-3 error — enough to
# break SE(3) exp/log round-trips). Default to full f32 precision globally;
# throughput-critical large kernels opt into lower precision explicitly via
# their own `precision=` / `preferred_element_type=` arguments.
_jax.config.update("jax_default_matmul_precision", "highest")

from mp2p_icp_tpu.core import se3  # noqa: F401
from mp2p_icp_tpu.core.pointcloud import PointCloud  # noqa: F401
from mp2p_icp_tpu.core.metric_map import MetricMap  # noqa: F401
