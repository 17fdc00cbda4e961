import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.utils import transforms as tf


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rot_roundtrip(rng):
    q = jnp.asarray(random_quats(rng, 64), jnp.float32)
    R = tf.quat_to_rot(q)
    q2 = tf.rot_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_rot_is_orthonormal(rng):
    q = jnp.asarray(random_quats(rng, 16), jnp.float32)
    R = tf.quat_to_rot(q)
    eye = jnp.eye(3)[None].repeat(16, 0)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_quat_multiply_matches_rot_compose(rng):
    q1 = jnp.asarray(random_quats(rng, 8), jnp.float32)
    q2 = jnp.asarray(random_quats(rng, 8), jnp.float32)
    R12 = tf.quat_to_rot(tf.quat_multiply(q1, q2))
    np.testing.assert_allclose(R12, tf.quat_to_rot(q1) @ tf.quat_to_rot(q2), atol=1e-5)


def test_known_quaternions():
    # 180 deg about x: wxyz (0, 1, 0, 0), the reference's init_quat
    R = tf.quat_to_rot(jnp.array([0.0, 1.0, 0.0, 0.0]))
    np.testing.assert_allclose(R, jnp.diag(jnp.array([1.0, -1.0, -1.0])), atol=1e-6)
    # 90 deg about z
    q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], dtype=jnp.float32)
    v = tf.quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_axis_angle_roundtrip(rng):
    # magnitudes < pi roundtrip exactly (rot_to_axis_angle is canonical)
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    mag = rng.uniform(0.01, 3.1, size=(32, 1))
    aa = jnp.asarray(axis * mag, jnp.float32)
    R = tf.axis_angle_to_rot(aa)
    aa2 = tf.rot_to_axis_angle(R)
    np.testing.assert_allclose(aa, aa2, atol=2e-4)


def test_axis_angle_large_angle_same_rotation(rng):
    # |aa| > pi maps back to the equivalent canonical rotation
    aa = jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32)
    aa2 = tf.rot_to_axis_angle(tf.axis_angle_to_rot(aa))
    np.testing.assert_allclose(
        tf.axis_angle_to_rot(aa2), tf.axis_angle_to_rot(aa), atol=1e-5
    )
    assert np.linalg.norm(np.asarray(aa2)) <= np.pi + 1e-5


def test_axis_angle_small_angle():
    aa = jnp.array([1e-10, 0.0, 0.0])
    R = tf.axis_angle_to_rot(aa)
    assert not np.any(np.isnan(np.asarray(R)))
    np.testing.assert_allclose(R, jnp.eye(3), atol=1e-8)
    q = tf.axis_angle_to_quat(aa)
    assert not np.any(np.isnan(np.asarray(q)))


def test_euler_matches_urdf_convention():
    # URDF rpy: R = Rz(y) Ry(p) Rx(r)
    rpy = jnp.array([0.3, -0.5, 1.2])
    R = tf.euler_to_rot(rpy)

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    expected = rz(1.2) @ ry(-0.5) @ rx(0.3)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_euler_roundtrip(rng):
    rpy = jnp.asarray(rng.uniform(-1.4, 1.4, size=(32, 3)), jnp.float32)
    R = tf.euler_to_rot(rpy)
    rpy2 = tf.rot_to_euler(R)
    np.testing.assert_allclose(rpy, rpy2, atol=1e-4)


def test_se3_inverse(rng):
    q = jnp.asarray(random_quats(rng, 4), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    T = tf.make_se3(tf.quat_to_rot(q), t)
    TT = T @ tf.se3_inverse(T)
    np.testing.assert_allclose(TT, jnp.eye(4)[None].repeat(4, 0), atol=1e-5)


def test_transform_points():
    T = tf.make_se3(tf.euler_to_rot(jnp.array([0.0, 0.0, jnp.pi / 2])), jnp.array([1.0, 0.0, 0.0]))
    pts = jnp.array([[1.0, 0.0, 0.0]])
    out = tf.transform_points(T, pts)
    np.testing.assert_allclose(out, jnp.array([[1.0, 1.0, 0.0]]), atol=1e-6)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(tf.quat_to_rot))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1))
    np.testing.assert_allclose(f(q), jnp.eye(3)[None].repeat(8, 0), atol=1e-6)
