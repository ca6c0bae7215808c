"""Unit tests for SO(3)/SE(3) (SURVEY.md SS4.1: exp/log inverses, f32 tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np

from sosvo.geom import lie


def _random_w(key, n, scale):
    return scale * jax.random.normal(key, (n, 3))


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    for scale in [1e-5, 1e-3, 0.1, 1.0, 2.5, 3.1]:
        w = _random_w(key, 64, scale)
        # Keep |w| < pi so the log is the principal one.
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = jnp.where(norm > 3.05, w * 3.05 / norm, w)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-4)


def test_so3_orthonormal():
    w = _random_w(jax.random.PRNGKey(1), 32, 1.5)
    R = lie.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    w = _random_w(key, 64, 1.2)
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.where(norm > 3.0, w * 3.0 / norm, w)  # principal-log domain
    xi = jnp.concatenate([w, _random_w(jax.random.PRNGKey(3), 64, 2.0)], axis=-1)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-4)


def test_se3_inverse():
    xi = jax.random.normal(jax.random.PRNGKey(4), (16, 6))
    T = lie.se3_exp(xi)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(np.asarray(lie.mat_inv(T) @ T), np.asarray(eye), atol=1e-5)


def test_quat_roundtrip():
    w = _random_w(jax.random.PRNGKey(5), 128, 2.0)
    R = lie.so3_exp(w)
    q = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(q[:, 0]) >= 0)


def test_near_pi_log():
    # Rotations very close to pi about random axes.
    key = jax.random.PRNGKey(6)
    axis = jax.random.normal(key, (32, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    theta = jnp.pi - 1e-4
    w = axis * theta
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_transform_points_matches_matmul():
    T = lie.se3_exp(jax.random.normal(jax.random.PRNGKey(7), (6,)))
    pts = jax.random.normal(jax.random.PRNGKey(8), (50, 3))
    out = lie.transform_points(T, pts)
    homo = jnp.concatenate([pts, jnp.ones((50, 1))], axis=-1)
    expected = (homo @ T.T)[:, :3]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda xi: jnp.sum(lie.se3_exp(xi)))
    g = jax.grad(lambda xi: jnp.sum(lie.se3_exp(xi) ** 2))
    xi = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, -0.5])
    assert np.isfinite(float(f(xi)))
    assert np.all(np.isfinite(np.asarray(g(xi))))
    # Gradient also finite at exactly zero (small-angle branch).
    assert np.all(np.isfinite(np.asarray(g(jnp.zeros(6)))))
