"""SE(3) Lie math unit tests.

Mirrors the reference's reliance on MRPT pose math correctness (the reference
trusts MRPT; we must prove our own). Covers exp/log round-trips including
near-0 and near-pi rotations, compose/inverse group laws, quaternion
conversions, and the yaw/pitch/roll constructor against known matrices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3


def rand_keys(n, seed=0):
    return jax.random.split(jax.random.key(seed), n)


class TestSO3:
    def test_exp_identity(self):
        R = se3.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_log_roundtrip_generic(self):
        for k in rand_keys(20, seed=1):
            w = jax.random.uniform(k, (3,), minval=-1.5, maxval=1.5)
            w2 = se3.so3_log(se3.so3_exp(w))
            np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_exp_log_roundtrip_small(self):
        w = jnp.array([1e-5, -2e-5, 3e-6])
        np.testing.assert_allclose(se3.so3_log(se3.so3_exp(w)), w, atol=1e-8)

    def test_exp_log_near_pi(self):
        for axis in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, 0.8, 0.0]):
            w = jnp.array(axis) / np.linalg.norm(axis) * (np.pi - 1e-3)
            w2 = se3.so3_log(se3.so3_exp(w))
            # log may return the equivalent flipped axis-angle; compare rotations
            np.testing.assert_allclose(
                se3.so3_exp(w2), se3.so3_exp(w), atol=1e-4
            )

    def test_known_rotation(self):
        # 90 deg about z
        w = jnp.array([0.0, 0.0, np.pi / 2])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(
            R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )

    def test_left_jacobian_inverse(self):
        for k in rand_keys(10, seed=2):
            w = jax.random.uniform(k, (3,), minval=-2.0, maxval=2.0)
            J = se3.so3_left_jacobian(w)
            Jinv = se3.so3_left_jacobian_inv(w)
            np.testing.assert_allclose(J @ Jinv, np.eye(3), atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self):
        for k in rand_keys(20, seed=3):
            v = jax.random.uniform(k, (6,), minval=-1.0, maxval=1.0)
            v2 = se3.log(se3.exp(v))
            np.testing.assert_allclose(v, v2, atol=3e-5)

    def test_compose_inverse(self):
        ka, kb = rand_keys(2, seed=4)
        a = se3.random_pose(ka)
        b = se3.random_pose(kb)
        ab = se3.compose(a, b)
        b2 = se3.compose(se3.inverse(a), ab)
        np.testing.assert_allclose(b2.R, b.R, atol=1e-5)
        np.testing.assert_allclose(b2.t, b.t, atol=1e-5)

    def test_apply_matches_matrix(self):
        (k,) = rand_keys(1, seed=5)
        p = se3.random_pose(k)
        pts = jax.random.normal(jax.random.key(6), (32, 3))
        out = se3.apply(p, pts)
        expect = pts @ np.asarray(p.R).T + np.asarray(p.t)
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_identity_action(self):
        pts = jax.random.normal(jax.random.key(7), (8, 3))
        np.testing.assert_allclose(se3.apply(se3.identity(), pts), pts, atol=0)

    def test_batched_ops(self):
        keys = rand_keys(4, seed=8)
        poses = jax.vmap(se3.random_pose)(jnp.stack(keys))
        logs = se3.log(poses)
        assert logs.shape == (4, 6)
        back = se3.exp(logs)
        np.testing.assert_allclose(back.R, poses.R, atol=1e-4)

    def test_error_log_norm_zero(self):
        (k,) = rand_keys(1, seed=9)
        p = se3.random_pose(k)
        assert float(se3.error_log_norm(p, p)) < 1e-5


class TestQuaternions:
    @pytest.mark.parametrize("seed", range(8))
    def test_rot_quat_roundtrip(self, seed):
        p = se3.random_pose(jax.random.key(seed))
        q = se3.rot_to_quat(p.R)
        R2 = se3.quat_to_rot(q)
        np.testing.assert_allclose(R2, p.R, atol=1e-5)

    def test_identity_quat(self):
        q = se3.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)


class TestYPR:
    def test_yaw_only(self):
        p = se3.from_xyz_ypr(1.0, 2.0, 3.0, np.pi / 2, 0.0, 0.0)
        np.testing.assert_allclose(
            p.R, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6
        )
        np.testing.assert_allclose(p.t, [1, 2, 3], atol=0)

    def test_pitch_only(self):
        p = se3.from_xyz_ypr(0, 0, 0, 0.0, np.pi / 2, 0.0)
        # pitch rotates x towards -z (ZYX convention)
        np.testing.assert_allclose(
            se3.apply(p, jnp.array([[1.0, 0, 0]]))[0], [0, 0, -1], atol=1e-6
        )

    def test_roll_only(self):
        p = se3.from_xyz_ypr(0, 0, 0, 0.0, 0.0, np.pi / 2)
        np.testing.assert_allclose(
            se3.apply(p, jnp.array([[0.0, 1.0, 0]]))[0], [0, 0, 1], atol=1e-6
        )


class TestSE3Jacobians:
    @pytest.mark.parametrize("seed", range(4))
    def test_right_jacobian_inv_vs_finite_diff(self, seed):
        # J = d log(T exp(eps)) / d eps at eps=0 where T = exp(xi):
        # equals Jr^-1(xi). Check by central finite differences.
        k = jax.random.key(seed + 70)
        xi = jax.random.uniform(k, (6,), minval=-0.8, maxval=0.8)
        T = se3.exp(xi)
        J = se3.se3_right_jacobian_inv(xi)
        h = 1e-3
        J_fd = np.zeros((6, 6), np.float32)
        for i in range(6):
            e = np.zeros(6, np.float32)
            e[i] = h
            lp = se3.log(se3.compose(T, se3.exp(jnp.asarray(e))))
            lm = se3.log(se3.compose(T, se3.exp(jnp.asarray(-e))))
            J_fd[:, i] = np.asarray(lp - lm) / (2 * h)
        np.testing.assert_allclose(J, J_fd, atol=5e-3)

    def test_right_jacobian_inv_identity(self):
        J = se3.se3_right_jacobian_inv(jnp.zeros(6))
        np.testing.assert_allclose(J, np.eye(6), atol=1e-6)


class TestDeltaNorms:
    def test_translation_delta(self):
        a = se3.identity()
        b = se3.Pose(jnp.eye(3), jnp.array([0.3, 0.4, 0.0]))
        dt, dr = se3.delta_norms(a, b)
        np.testing.assert_allclose(dt, 0.5, atol=1e-6)
        np.testing.assert_allclose(dr, 0.0, atol=1e-6)
