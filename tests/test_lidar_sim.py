"""Spinning-LiDAR simulator validation (VERDICT r3 Next #2).

The structured workload must (a) place returns on the analytic surfaces,
(b) carry real motion distortion that FilterDeskew's constant-twist model
(reference: mp2p_icp_filters/src/FilterDeskew.cpp:69-275) provably undoes,
and (c) expose ring/time/intensity channels with LiDAR-like structure.
"""

import jax.numpy as jnp
import numpy as np

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.eval.lidar_sim import (
    make_street_scene,
    render_spinning_scan,
    scan_to_pointcloud,
)
from mp2p_icp_tpu.filters.deskew import FilterDeskew


def surface_distance(scene, pts):
    """Distance from world points to the nearest analytic surface."""
    ds = [np.abs(pts[:, 2] - scene.ground_z)[:, None]]
    for (axis, pos, lo, hi, z0, z1) in scene.walls:
        other = 1 - axis
        inb = (
            (pts[:, other] >= lo) & (pts[:, other] <= hi)
            & (pts[:, 2] >= z0) & (pts[:, 2] <= z1)
        )
        ds.append(np.where(inb, np.abs(pts[:, axis] - pos), 1e9)[:, None])
    for (cx, cy, r, h) in scene.cylinders:
        inz = (pts[:, 2] >= 0) & (pts[:, 2] <= h)
        dr = np.abs(np.hypot(pts[:, 0] - cx, pts[:, 1] - cy) - r)
        ds.append(np.where(inz, dr, 1e9)[:, None])
    return np.concatenate(ds, 1).min(1)


class TestLidarSim:
    def setup_method(self):
        self.rng = np.random.RandomState(0)
        self.scene = make_street_scene(self.rng, length=120.0)
        self.pose0 = se3.from_xyz_ypr(20.0, 0.0, 1.8, 0.1, 0.0, 0.0)

    def test_static_scan_lies_on_surfaces(self):
        scan = render_spinning_scan(
            self.scene, self.pose0, np.zeros(6), self.rng,
            n_rings=32, n_azimuth=512,
        )
        v = scan["valid"]
        assert v.sum() > 10_000  # dense structured sweep
        w = np.asarray(se3.apply(self.pose0, jnp.asarray(scan["xyz"][v])))
        res = surface_distance(self.scene, w)
        assert np.median(res) < 0.05  # ~range noise
        # channel structure
        assert np.unique(scan["ring"][v]).size == 32
        assert scan["time"].min() < -0.04 and scan["time"].max() > 0.04
        assert 0.0 < scan["intensity"][v].mean() < 1.0
        # range-dependent density: nearby band denser than far band
        rng_pts = np.linalg.norm(scan["xyz"][v], axis=1)
        assert (rng_pts < 10).sum() > (rng_pts > 40).sum()

    def test_motion_distortion_and_deskew_recovery(self):
        """The raw moving sweep is measurably distorted; FilterDeskew with
        the true twist removes it (the end-to-end deskew-realism contract
        the unstructured point soups never exercised)."""
        twist = np.array([10.0, 0.0, 0.0, 0.0, 0.0, 0.9])
        scan = render_spinning_scan(
            self.scene, self.pose0, twist, self.rng,
            n_rings=32, n_azimuth=512,
        )
        v = scan["valid"]
        w_raw = np.asarray(se3.apply(self.pose0, jnp.asarray(scan["xyz"][v])))
        res_raw = surface_distance(self.scene, w_raw)

        pc = scan_to_pointcloud(scan)
        dsk = FilterDeskew(twist=tuple(twist))({"raw": pc})["deskewed"]
        n = int(dsk.count)
        w_dsk = np.asarray(se3.apply(self.pose0, dsk.xyz[:n]))
        res_dsk = surface_distance(self.scene, w_dsk)

        assert res_raw.mean() > 0.04  # distortion is real
        assert res_dsk.mean() < 0.35 * res_raw.mean()  # and removed
        assert res_dsk.mean() < 0.02

    def test_occlusion(self):
        """A pillar between sensor and wall shadows the wall: no returns
        behind the occluder along those rays (nearest-hit semantics)."""
        from mp2p_icp_tpu.eval.lidar_sim import Scene

        scene = Scene(
            walls=[(0, 10.0, -5.0, 5.0, 0.0, 4.0)],
            cylinders=[(5.0, 0.0, 0.5, 4.0)],
        )
        pose = se3.from_xyz_ypr(0.0, 0.0, 1.5, 0.0, 0.0, 0.0)
        scan = render_spinning_scan(
            scene, pose, np.zeros(6), self.rng, n_rings=16, n_azimuth=256,
            range_noise=0.0,
        )
        v = scan["valid"]
        pts = scan["xyz"][v]
        rngs = np.linalg.norm(pts, axis=1)
        # rays straight ahead (small |azimuth|) at pillar height must stop
        # at the pillar (~4.5 m), never reach the wall (10 m)
        az = np.arctan2(pts[:, 1], pts[:, 0])
        frontal = (np.abs(az) < 0.06) & (pts[:, 2] > -1.0) & (pts[:, 2] < 2.0)
        assert frontal.sum() > 5
        assert rngs[frontal].max() < 6.0
