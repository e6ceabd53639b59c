from mp2p_icp_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from mp2p_icp_tpu.parallel.batch import make_batched_align  # noqa: F401
