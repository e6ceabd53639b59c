from mp2p_icp_tpu.pipeline.yaml_loader import (  # noqa: F401
    filter_pipeline_from_yaml,
    filter_pipeline_from_yaml_file,
    icp_pipeline_from_yaml,
    icp_pipeline_from_yaml_file,
)
