from mp2p_icp_tpu.io.xyz import load_xyz_file, save_xyz_file  # noqa: F401
