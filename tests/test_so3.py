"""SO(3) exp/log round-trip and edge-case tests (reference: so3.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphericalsfm_tpu.geometry import skew, so3_exp, so3_log, rotation_angle


def _random_axis_angles(seed, n, min_angle=0.0, max_angle=np.pi):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(min_angle, max_angle, size=(n, 1))
    return axes * angles


def test_skew_cross_product():
    rng = np.random.default_rng(0)
    a = rng.normal(size=3)
    b = rng.normal(size=3)
    np.testing.assert_allclose(np.asarray(skew(a)) @ b, np.cross(a, b), atol=1e-14)


def test_exp_orthogonality():
    r = jnp.asarray(_random_axis_angles(1, 100))
    R = so3_exp(r)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


@pytest.mark.parametrize("lo,hi", [(0.0, 0.7), (0.7, 2.2), (2.2, np.pi - 1e-7)])
def test_log_exp_roundtrip_all_regimes(lo, hi):
    r = jnp.asarray(_random_axis_angles(2, 200, lo, hi))
    r2 = so3_log(so3_exp(r))
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=1e-7)


def test_log_identity():
    np.testing.assert_allclose(np.asarray(so3_log(jnp.eye(3))), 0.0, atol=1e-14)


def test_log_near_pi():
    r = jnp.asarray(_random_axis_angles(3, 50, np.pi - 1e-4, np.pi - 1e-6))
    R = so3_exp(r)
    r2 = so3_log(R)
    # Angle and axis (up to the same sign) must match.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r2), axis=-1),
        np.linalg.norm(np.asarray(r), axis=-1),
        atol=1e-6,
    )
    R2 = so3_exp(r2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_rotation_angle():
    r = jnp.asarray(_random_axis_angles(4, 50, 0.1, 3.0))
    ang = rotation_angle(so3_exp(r))
    np.testing.assert_allclose(
        np.asarray(ang), np.linalg.norm(np.asarray(r), axis=-1), atol=1e-9
    )


def test_grad_through_exp_log():
    """exp/log must be differentiable (used inside LM/pose-graph optimizers)."""

    def f(rvec):
        return jnp.sum(so3_log(so3_exp(rvec)) ** 2)

    g = jax.grad(f)(jnp.array([0.3, -0.2, 0.5]))
    np.testing.assert_allclose(np.asarray(g), 2 * np.array([0.3, -0.2, 0.5]), atol=1e-6)
