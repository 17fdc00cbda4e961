"""Host-side (numpy) duplicates of the small-matrix transform helpers.

The renderer facade does a handful of 4x4/quaternion conversions per step.
Computing them with jnp puts a device round-trip in every call site — on
the TPU-tunnel runtime a single device->host sync costs seconds, which
dominated scene construction. These numpy twins keep facade-level scalar
math on the host; the jitted hot paths keep using utils.transforms.
"""

from __future__ import annotations

import numpy as np


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q, np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = np.moveaxis(q, -1, 0)
    rows = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    return rows


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    R = np.asarray(R, np.float64)
    batch = R.shape[:-2]
    Rf = R.reshape(-1, 3, 3)
    out = np.zeros((len(Rf), 4))
    for i, m in enumerate(Rf):  # tiny batches at the facade level
        tr = np.trace(m)
        if tr > 0:
            s = np.sqrt(tr + 1.0) * 2
            out[i] = [0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s]
        elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
            s = np.sqrt(max(1.0 + m[0, 0] - m[1, 1] - m[2, 2], 1e-12)) * 2
            out[i] = [(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                      (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s]
        elif m[1, 1] > m[2, 2]:
            s = np.sqrt(max(1.0 + m[1, 1] - m[0, 0] - m[2, 2], 1e-12)) * 2
            out[i] = [(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
                      0.25 * s, (m[1, 2] + m[2, 1]) / s]
        else:
            s = np.sqrt(max(1.0 + m[2, 2] - m[0, 0] - m[1, 1], 1e-12)) * 2
            out[i] = [(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
                      (m[1, 2] + m[2, 1]) / s, 0.25 * s]
    out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return out.reshape(batch + (4,))


def rot_to_axis_angle(R: np.ndarray) -> np.ndarray:
    q = rot_to_quat(R)
    q = q * np.where(q[..., :1] < 0, -1.0, 1.0)
    w = np.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    n = np.linalg.norm(xyz, axis=-1)
    theta = 2.0 * np.arctan2(n, w)
    scale = np.where(n < 1e-9, 2.0, theta / np.maximum(n, 1e-9))
    return xyz * scale[..., None]


def axis_angle_to_rot(aa: np.ndarray) -> np.ndarray:
    aa = np.asarray(aa, np.float64)
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / np.maximum(theta, 1e-12)
    x, y, z = np.moveaxis(axis, -1, 0)
    zero = np.zeros_like(x)
    K = np.stack([
        np.stack([zero, -z, y], -1),
        np.stack([z, zero, -x], -1),
        np.stack([-y, x, zero], -1),
    ], axis=-2)
    t = theta[..., None]
    eye = np.broadcast_to(np.eye(3), K.shape)
    R = eye + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)
    return np.where(t < 1e-9, eye + K * t, R)
