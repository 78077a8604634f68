"""Quaternion / spatial algebra unit tests."""

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import mathx as mx


def _rand_quat(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return jnp.asarray(q)


def test_quat_mat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = _rand_quat(rng)
        m = mx.quat_to_mat(q)
        q2 = mx.mat_to_quat(m)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-12)


def test_rotate_matches_matrix():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = _rand_quat(rng)
        v = jnp.asarray(rng.randn(3))
        np.testing.assert_allclose(
            np.asarray(mx.rotate(v, q)),
            np.asarray(mx.quat_to_mat(q) @ v), atol=1e-12)


def test_quat_mul_associative_with_rotation():
    rng = np.random.RandomState(2)
    q1, q2 = _rand_quat(rng), _rand_quat(rng)
    v = jnp.asarray(rng.randn(3))
    np.testing.assert_allclose(
        np.asarray(mx.rotate(v, mx.quat_mul(q1, q2))),
        np.asarray(mx.rotate(mx.rotate(v, q2), q1)), atol=1e-12)


def test_quat_integrate_small_angle():
    q = jnp.array([1.0, 0, 0, 0])
    omega = jnp.array([0.0, 0, 1.0])
    q2 = mx.quat_integrate(q, omega, 0.1)
    # rotation of 0.1 rad about z
    np.testing.assert_allclose(
        np.asarray(q2), [np.cos(0.05), 0, 0, np.sin(0.05)], atol=1e-12)


def test_inert_shift_roundtrip():
    rng = np.random.RandomState(3)
    mass = jnp.asarray(2.5)
    diag = jnp.asarray(np.abs(rng.randn(3)) + 1.0)
    ipos = jnp.asarray(rng.randn(3))
    imat = mx.quat_to_mat(_rand_quat(rng))
    inert = mx.inert_from_body(mass, diag, ipos, imat)
    # shifting to a new origin and back preserves the 10-vector
    off = jnp.asarray(rng.randn(3))
    shifted = mx.inert_shift(inert, off)
    back = mx.inert_shift(shifted, -off)
    np.testing.assert_allclose(np.asarray(back), np.asarray(inert),
                               atol=1e-10)


def test_motion_force_cross_duality():
    rng = np.random.RandomState(4)
    v = jnp.asarray(rng.randn(6))
    m_ = jnp.asarray(rng.randn(6))
    f = jnp.asarray(rng.randn(6))
    # <v x m, f> = -<m, v x* f>
    lhs = jnp.dot(mx.motion_cross(v, m_), f)
    rhs = -jnp.dot(m_, mx.force_cross(v, f))
    np.testing.assert_allclose(float(lhs), float(rhs), atol=1e-10)
