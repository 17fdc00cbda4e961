"""SE(3) / quaternion / Euler math in pure JAX.

Replaces the reference's mixture of kornia conversions, transforms3d euler
helpers, and hand-rolled numpy quaternion code (reference:
sim/utils/gs/transform_utils.py:40-55, sim/utils/robot/robot_pc_sampler.py:17-32,
and kornia.geometry.conversions call sites throughout sim/). All functions are
jit/vmap-friendly, broadcast over leading batch dims, and use the **wxyz**
quaternion convention (matching kornia's default used by the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# quaternions (wxyz)
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, wxyz. Broadcasts over batch dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3, 3). Normalizes internally."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rot_to_quat(R: jax.Array, eps: float = 1e-12) -> jax.Array:
    """(..., 3, 3) -> (..., 4) wxyz.

    Branch-free Shepperd's method: computes all four candidate solutions and
    selects the numerically safest (largest pivot), so it is stable under jit
    and vmap (unlike the sqrt-of-trace formula the reference uses at
    sim/utils/gs/transform_utils.py:50-55, which NaNs when trace < -1).
    """
    m = R
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, eps))

    # candidate 0: pivot on w
    sw = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1)
    # candidate 1: pivot on x
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], -1)
    # candidate 2: pivot on y
    sy = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], -1)
    # candidate 3: pivot on z
    sz = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], -1)

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return quat_normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    R = quat_to_rot(q)
    return jnp.einsum("...ij,...j->...i", R, v)


# ---------------------------------------------------------------------------
# axis-angle
# ---------------------------------------------------------------------------


def axis_angle_to_rot(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3) rotation vector -> (..., 3, 3) via Rodrigues, small-angle safe."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = theta < eps
    axis = aa / jnp.where(small, jnp.ones_like(theta), theta)
    x, y, z = jnp.moveaxis(axis, -1, 0)
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    # first-order fallback for tiny angles (exact at theta -> 0)
    R_small = eye + K * t
    return jnp.where(small[..., None], R_small, R)


def rot_to_axis_angle(R: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(..., 3, 3) -> (..., 3) rotation vector (via quaternion log)."""
    q = rot_to_quat(R)
    # enforce w >= 0 for the shortest rotation
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(n[..., 0], w)
    scale = jnp.where(n[..., 0] < eps, 2.0, theta / jnp.maximum(n[..., 0], eps))
    return xyz * scale[..., None]


def axis_angle_to_quat(aa: jax.Array, eps: float = 1e-8) -> jax.Array:
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta[..., 0] < eps
    sinc = jnp.where(small[..., None], 0.5, jnp.sin(half) / jnp.maximum(theta, eps))
    return jnp.concatenate([jnp.cos(half), aa * sinc], axis=-1)


# ---------------------------------------------------------------------------
# Euler (static sxyz, matching transforms3d.euler with axes='sxyz')
# ---------------------------------------------------------------------------


def euler_to_rot(rpy: jax.Array) -> jax.Array:
    """(..., 3) roll/pitch/yaw about fixed x, y, z axes -> (..., 3, 3).

    R = Rz(yaw) @ Ry(pitch) @ Rx(roll), the URDF ``rpy`` convention.
    """
    r, p, y = jnp.moveaxis(rpy, -1, 0)
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_to_euler(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """(..., 3, 3) -> (..., 3) static-xyz Euler angles (gimbal-safe clamp)."""
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    p = jnp.arcsin(sp)
    cp = jnp.cos(p)
    safe = jnp.abs(cp) > eps
    r = jnp.where(safe, jnp.arctan2(R[..., 2, 1], R[..., 2, 2]), jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]))
    y = jnp.where(safe, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), jnp.zeros_like(p))
    return jnp.stack([r, p, y], axis=-1)


# ---------------------------------------------------------------------------
# homogeneous SE(3)
# ---------------------------------------------------------------------------


def make_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


def xyzrpy_to_se3(xyz, rpy) -> jax.Array:
    return make_se3(euler_to_rot(jnp.asarray(rpy)), jnp.asarray(xyz))
