from mp2p_icp_tpu.utils.profiler import Profiler, profile_scope  # noqa: F401
