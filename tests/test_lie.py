import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_loop_closing_tpu.ops import lie
from fixtures.synthetic import random_rotation, rotation_from_axis_angle


def test_exp_log_roundtrip(rng):
    for _ in range(20):
        rvec = rng.normal(size=3)
        R = lie.so3_exp(jnp.asarray(rvec, jnp.float32))
        back = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(back), rvec, atol=1e-4)


def test_exp_matches_numpy_rodrigues(rng):
    for _ in range(10):
        axis = rng.normal(size=3)
        angle = rng.uniform(-3, 3)
        rvec = axis / np.linalg.norm(axis) * angle
        R_ref = rotation_from_axis_angle(axis, angle)
        R = lie.so3_exp(jnp.asarray(rvec, jnp.float32))
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_log_small_angle():
    rvec = jnp.array([1e-6, -2e-6, 1e-6], jnp.float32)
    R = lie.so3_exp(rvec)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(rvec),
                               atol=1e-7)


def test_log_near_pi(rng):
    for _ in range(5):
        axis = rng.normal(size=3)
        axis = axis / np.linalg.norm(axis)
        angle = np.pi - 1e-4
        R = rotation_from_axis_angle(axis, angle)
        rvec = np.asarray(lie.so3_log(jnp.asarray(R, jnp.float32)))
        R_back = rotation_from_axis_angle(rvec, np.linalg.norm(rvec))
        np.testing.assert_allclose(R_back, R, atol=1e-3)


def test_exp_log_grad_finite():
    g = jax.grad(lambda r: jnp.sum(lie.so3_exp(r)))(jnp.zeros(3, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    g2 = jax.grad(lambda r: jnp.sum(lie.so3_log(lie.so3_exp(r)) ** 2))(
        jnp.array([0.3, -0.2, 0.5], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_rotation_error(rng):
    R1 = jnp.asarray(random_rotation(rng), jnp.float32)
    axis = rng.normal(size=3)
    delta = rotation_from_axis_angle(axis, 0.25)
    R2 = jnp.asarray(delta, jnp.float32) @ R1
    err = lie.rotation_error(R2, R1)
    np.testing.assert_allclose(float(err), 0.25, atol=1e-4)


def test_pose_params_roundtrip(rng):
    R = jnp.asarray(random_rotation(rng), jnp.float32)
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    p = lie.pose_to_params(R, t)
    R2, t2 = lie.params_to_pose(p)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_compose_relative_consistency(rng):
    Ra = jnp.asarray(random_rotation(rng), jnp.float32)
    ta = jnp.asarray(rng.normal(size=3), jnp.float32)
    Rb = jnp.asarray(random_rotation(rng), jnp.float32)
    tb = jnp.asarray(rng.normal(size=3), jnp.float32)
    R_rel, t_rel = lie.relative(Ra, ta, Rb, tb)
    Rc, tc = lie.compose(R_rel, t_rel, Ra, ta)
    np.testing.assert_allclose(np.asarray(Rc), np.asarray(Rb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.asarray(tb), atol=1e-5)


def test_camera_center(rng):
    R = jnp.asarray(random_rotation(rng), jnp.float32)
    C = jnp.asarray(rng.normal(size=3), jnp.float32)
    t = -R @ C
    np.testing.assert_allclose(np.asarray(lie.camera_center(R, t)),
                               np.asarray(C), atol=1e-5)
