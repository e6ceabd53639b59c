"""Demo configs must load and run end-to-end (configs[0], [3] of
BASELINE.json at test scale)."""

import numpy as np
import yaml

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.core.pointcloud import PointCloud
from mp2p_icp_tpu.filters.generator import Observation
from mp2p_icp_tpu.filters.sm2mm import (
    Keyframe,
    SimpleMap,
    simplemap_to_metricmap,
)
from mp2p_icp_tpu.pipeline.yaml_loader import load_icp_config_file


class TestDemoConfigs:
    def test_example1_loads_and_registers(self):
        import jax.numpy as jnp

        from mp2p_icp_tpu.filters import apply_filter_pipeline
        from mp2p_icp_tpu.io.xyz import load_xyz_file

        icp, params, sections = load_icp_config_file(
            "/root/repo/demos/icp-settings-example1.yaml"
        )
        pc = load_xyz_file("/root/reference/demos/bunny_decim.xyz.gz",
                           decimation=4)
        gt = se3.from_xyz_ypr(0.01, -0.008, 0.004, 0.08, -0.05, 0.03)
        local_xyz = np.array(se3.apply(se3.inverse(gt), jnp.asarray(pc.to_numpy())))
        g = apply_filter_pipeline(sections["filters_global_map"], {"raw": pc})
        l = apply_filter_pipeline(
            sections["filters_local_map"],
            {"raw": PointCloud.from_numpy(local_xyz)},
        )
        res = icp.align(l, g, se3.identity(), params)
        assert float(se3.error_log_norm(gt, res.optimal_tf)) < 0.1

    def test_kitti_config_loads(self):
        icp, params, sections = load_icp_config_file(
            "/root/repo/demos/icp-settings-kitti.yaml"
        )
        assert len(icp.solvers) == 2 and len(icp.matchers) == 2

    def test_sm2mm_voxel_static_dynamic(self):
        with open("/root/repo/demos/sm2mm_voxelmap_static_dynamic.yaml") as f:
            cfg = yaml.safe_load(f)
        # shrink capacities to test scale (CPU: the lookup is O(N*C))
        for section in ("filters", "final_filters"):
            for entry in cfg.get(section, []):
                entry.setdefault("params", {})
                if "Merge" in entry["class_name"]:
                    entry["params"]["target_capacity"] = 2048
                if "GeneratorVoxelMap" in entry["class_name"]:
                    entry["params"]["capacity"] = 4096
        rng = np.random.RandomState(0)
        # static wall seen from both keyframes; a transient blob only in kf1
        wall = np.stack(
            [np.full(200, 8.0) + rng.normal(0, 0.05, 200),
             rng.uniform(-3, 3, 200), rng.uniform(0, 2, 200)], 1)
        blob = rng.normal(0, 0.2, (40, 3)) + [[4.0, 0.0, 1.0]]
        sm = SimpleMap()
        sm.keyframes.append(
            Keyframe(pose=se3.identity(),
                     observations=[Observation(
                         xyz=np.concatenate([wall, blob]).astype(np.float32))])
        )
        sm.keyframes.append(
            Keyframe(pose=se3.identity(),
                     observations=[Observation(xyz=wall.astype(np.float32))])
        )
        mm = simplemap_to_metricmap(sm, cfg)
        assert "static_points" in mm.layers
        assert "dynamic_points" in mm.layers
        n_static = int(mm.layers["static_points"].count)
        n_dyn = int(mm.layers["dynamic_points"].count)
        # most wall points static; blob (seen once, then carved) dynamic
        assert n_static > 250
        stat = mm.layers["static_points"].to_numpy()
        assert (stat[:, 0] > 6).mean() > 0.9  # static points are on the wall
