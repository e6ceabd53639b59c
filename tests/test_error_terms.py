"""Analytic-vs-autodiff Jacobian checks for all five error terms.

Mirrors the reference's tests/test-mp2p_error_terms_jacobians.cpp (category 1
in SURVEY.md §4): each hand-derived Jacobian is compared against jax
autodiff of the residual w.r.t. a right se(3) perturbation at the
linearisation point.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mp2p_icp_tpu.core import se3
from mp2p_icp_tpu.solvers import error_terms

ATOL = 1e-4


def autodiff_jacobian(res_fn, pose):
    """J = d res(pose ∘ exp(eps)) / d eps at eps = 0, via jacfwd."""

    def f(eps):
        return res_fn(se3.compose(pose, se3.exp(eps)))

    return jax.jacfwd(f)(jnp.zeros(6, jnp.float32))


@pytest.fixture
def pose():
    return se3.random_pose(jax.random.key(42), max_trans=2.0, max_angle=2.0)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestPoint2Point:
    def test_jacobian(self, pose, rng):
        l = jnp.asarray(rng.randn(5, 3), jnp.float32)
        g = jnp.asarray(rng.randn(5, 3), jnp.float32)
        r, J = error_terms.error_point2point(pose, l, g)
        J_auto = autodiff_jacobian(
            lambda p: error_terms.error_point2point(p, l, g)[0], pose
        )
        np.testing.assert_allclose(J, J_auto, atol=ATOL)

    def test_residual_zero_at_truth(self, pose):
        l = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
        g = se3.apply(pose, l)
        r, _ = error_terms.error_point2point(pose, l, g)
        np.testing.assert_allclose(r, 0, atol=1e-5)


class TestPoint2Line:
    def test_jacobian(self, pose, rng):
        l = jnp.asarray(rng.randn(5, 3), jnp.float32)
        p0 = jnp.asarray(rng.randn(5, 3), jnp.float32)
        u = jnp.asarray(unit(rng.randn(5, 3)), jnp.float32)
        r, J = error_terms.error_point2line(pose, l, p0, u)
        J_auto = autodiff_jacobian(
            lambda p: error_terms.error_point2line(p, l, p0, u)[0], pose
        )
        np.testing.assert_allclose(J, J_auto, atol=ATOL)

    def test_zero_on_line(self, pose):
        # local point that lands exactly on the line after transform
        p0 = jnp.array([[1.0, 2.0, 3.0]])
        u = jnp.array([[0.0, 0.0, 1.0]])
        target = p0 + 2.5 * u  # a point on the line
        l = se3.apply(se3.inverse(pose), target)
        r, _ = error_terms.error_point2line(pose, l, p0, u)
        np.testing.assert_allclose(r, 0, atol=1e-4)


class TestPoint2Plane:
    def test_jacobian(self, pose, rng):
        l = jnp.asarray(rng.randn(5, 3), jnp.float32)
        c = jnp.asarray(rng.randn(5, 3), jnp.float32)
        n = jnp.asarray(unit(rng.randn(5, 3)), jnp.float32)
        r, J = error_terms.error_point2plane(pose, l, c, n)
        J_auto = autodiff_jacobian(
            lambda p: error_terms.error_point2plane(p, l, c, n)[0], pose
        )
        np.testing.assert_allclose(J, J_auto, atol=ATOL)

    def test_residual_is_plane_distance(self, pose):
        c = jnp.array([[0.0, 0.0, 1.0]])
        n = jnp.array([[0.0, 0.0, 1.0]])
        target = jnp.array([[5.0, -3.0, 1.7]])  # 0.7 above plane z=1
        l = se3.apply(se3.inverse(pose), target)
        r, _ = error_terms.error_point2plane(pose, l, c, n)
        np.testing.assert_allclose(np.linalg.norm(r), 0.7, atol=1e-4)


class TestPlane2Plane:
    def test_jacobian(self, pose, rng):
        nl = jnp.asarray(unit(rng.randn(5, 3)), jnp.float32)
        ng = jnp.asarray(unit(rng.randn(5, 3)), jnp.float32)
        r, J = error_terms.error_plane2plane(pose, nl, ng)
        J_auto = autodiff_jacobian(
            lambda p: error_terms.error_plane2plane(p, nl, ng)[0], pose
        )
        np.testing.assert_allclose(J, J_auto, atol=ATOL)

    def test_translation_invariant(self, pose, rng):
        nl = jnp.asarray(unit(rng.randn(3, 3)), jnp.float32)
        ng = jnp.asarray(unit(rng.randn(3, 3)), jnp.float32)
        _, J = error_terms.error_plane2plane(pose, nl, ng)
        np.testing.assert_allclose(J[:, :, :3], 0, atol=0)


class TestLine2Line:
    def test_jacobian(self, pose, rng):
        pl = jnp.asarray(rng.randn(4, 3), jnp.float32)
        ul = jnp.asarray(unit(rng.randn(4, 3)), jnp.float32)
        pg = jnp.asarray(rng.randn(4, 3), jnp.float32)
        ug = jnp.asarray(unit(rng.randn(4, 3)), jnp.float32)
        r, J = error_terms.error_line2line(pose, pl, ul, pg, ug)
        assert r.shape == (4, 6) and J.shape == (4, 6, 6)
        J_auto = autodiff_jacobian(
            lambda p: error_terms.error_line2line(p, pl, ul, pg, ug)[0], pose
        )
        np.testing.assert_allclose(J, J_auto, atol=ATOL)

    def test_zero_for_same_line(self, pose):
        pg = jnp.array([[1.0, 0.0, 0.0]])
        ug = jnp.array([[0.0, 1.0, 0.0]])
        # local line = global line pulled back through the pose
        inv = se3.inverse(pose)
        pl = se3.apply(inv, pg)
        ul = se3.rotate(inv, ug)
        r, _ = error_terms.error_line2line(pose, pl, ul, pg, ug)
        np.testing.assert_allclose(r, 0, atol=1e-4)
