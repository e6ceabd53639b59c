from mp2p_icp_tpu.eval.trajectory import (  # noqa: F401
    ate_rmse,
    load_kitti_poses,
    rpe,
    save_kitti_poses,
    umeyama_align,
)
