"""Per-Gaussian rasterization preprocessing, vmapped over all Gaussians.

Functional parity with ``preprocessCUDA``
(reference: third-party/diff-gaussian-rasterization-w-depth/cuda_rasterizer/
forward.cu:118-257 and auxiliary.h:139-166), as dense jnp over the whole
splat set:

  - z-threshold near culling (the fork's ``z_threshold``, auxiliary.h:155)
  - 3D covariance from scale + quaternion (forward.cu:118-152)
  - EWA projection to 2D conic with the 1.3*tanfov frustum clamp and the
    +0.3 px low-pass (forward.cu:74-113)
  - 3-sigma radius from the covariance eigenvalues, with the 0.1 floor
    under the sqrt (forward.cu:230-233)
  - SH -> clamped RGB along the camera ray (forward.cu:20-71)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import transforms as tf
from ..utils.sh import sh_to_rgb_clamped
from .camera import Camera


def preprocess_gaussians(
    cam: Camera,
    w2c: jax.Array,
    means3d: jax.Array,     # (N, 3)
    scales: jax.Array,      # (N, 3) linear scales (post-exp)
    quats: jax.Array,       # (N, 4) wxyz (normalized internally)
    opacities: jax.Array,   # (N,) or (N, 1) post-sigmoid
    shs: jax.Array,         # (N, K, 3)
    sh_degree: int,
    scale_modifier: float = 1.0,
):
    """Returns a dict of per-Gaussian raster quantities + validity mask."""
    opacities = opacities.reshape(-1)
    w2c = jnp.asarray(w2c, means3d.dtype)

    # view/projection (expanded: no (N,3)@(3,3) dot_general) ---------------
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    p_view = jnp.stack(
        [w2c[0, 0] * mx + w2c[0, 1] * my + w2c[0, 2] * mz + w2c[0, 3],
         w2c[1, 0] * mx + w2c[1, 1] * my + w2c[1, 2] * mz + w2c[1, 3],
         w2c[2, 0] * mx + w2c[2, 1] * my + w2c[2, 2] * mz + w2c[2, 3]],
        axis=-1)
    depth = p_view[:, 2]
    visible = depth > cam.z_threshold  # in_frustum near cull

    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    w, h = cam.width, cam.height
    near, far = cam.near, cam.far

    # full projective transform, OpenGL-style with principal-point shift
    # (transform_utils.py:12-16): ndc then ndc2Pix (auxiliary.h ndc2Pix)
    zs = jnp.maximum(depth, 1e-7)
    ndc_x = (2.0 * fx / w) * p_view[:, 0] / zs - (w - 2.0 * cx) / w
    ndc_y = (2.0 * fy / h) * p_view[:, 1] / zs - (h - 2.0 * cy) / h
    xy = jnp.stack([((ndc_x + 1.0) * w - 1.0) * 0.5,
                    ((ndc_y + 1.0) * h - 1.0) * 0.5], axis=-1)

    # cov3D from scale+quat (forward.cu:118-152): Sigma = R S S R^T --------
    # fully expanded to elementwise (N,) expressions: batched (N,3,3)
    # micro-matmuls each lower to a standalone slow dot_general on TPU,
    # while this whole block fuses into the surrounding elementwise kernel
    qn = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    qw, qx, qy, qz = (qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3])
    sx = scales[:, 0] * scale_modifier
    sy = scales[:, 1] * scale_modifier
    sz = scales[:, 2] * scale_modifier
    # rows of M = R * diag(s): m[a][j] = R[a,j] * s[j]
    m = (
        ((1 - 2 * (qy * qy + qz * qz)) * sx,
         2 * (qx * qy - qw * qz) * sy,
         2 * (qx * qz + qw * qy) * sz),
        (2 * (qx * qy + qw * qz) * sx,
         (1 - 2 * (qx * qx + qz * qz)) * sy,
         2 * (qy * qz - qw * qx) * sz),
        (2 * (qx * qz - qw * qy) * sx,
         2 * (qy * qz + qw * qx) * sy,
         (1 - 2 * (qx * qx + qy * qy)) * sz),
    )
    # cov3d = M @ M^T, 6 unique entries
    c3 = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(a, 3):
            c3[a][b] = c3[b][a] = (m[a][0] * m[b][0] + m[a][1] * m[b][1]
                                   + m[a][2] * m[b][2])

    # EWA cov2D (forward.cu:74-113) ---------------------------------------
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    txtz = jnp.clip(p_view[:, 0] / zs, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / zs, -limy, limy)
    tz = zs
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]
    j00 = fx / tz
    j02 = -fx * txtz / tz
    j11 = fy / tz
    j12 = -fy * tytz / tz
    W = w2c[:3, :3]                              # view rotation (scalars)
    # T = J @ W: T[0][k] = j00*W[0,k] + j02*W[2,k]; T[1][k] likewise
    t0 = [j00 * W[0, k] + j02 * W[2, k] for k in range(3)]
    t1 = [j11 * W[1, k] + j12 * W[2, k] for k in range(3)]

    def quad(ta, tb):
        # ta . cov3d . tb
        u = [ta[0] * c3[0][l] + ta[1] * c3[1][l] + ta[2] * c3[2][l]
             for l in range(3)]
        return u[0] * tb[0] + u[1] * tb[1] + u[2] * tb[2]

    cov_a = quad(t0, t0) + 0.3
    cov_b = quad(t0, t1)
    cov_c = quad(t1, t1) + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det > 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cov_c * det_inv, -cov_b * det_inv, cov_a * det_inv], -1)

    # 3-sigma screen radius (forward.cu:230-233)
    mid = 0.5 * (cov_a + cov_c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    # SH -> RGB (forward.cu:20-71); camera center = -R^T t
    cam_pos = -(w2c[:3, :3].T @ w2c[:3, 3])
    dirs = means3d - cam_pos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    rgb = sh_to_rgb_clamped(sh_degree, shs, dirs)

    valid = visible & det_ok & (opacities > 0.0)
    return {
        "xy": xy,                 # (N, 2) pixel center
        "depth": depth,           # (N,) view z
        "conic": conic,           # (N, 3) inverse-cov upper triangle
        "opacity": opacities,     # (N,)
        "rgb": rgb,               # (N, 3)
        "radius": jnp.where(valid, radius, 0.0),
        "valid": valid,
    }


def tile_rect(xy, radius, n_tiles_x, n_tiles_y, tile_w, tile_h):
    """Tile-bounding rect per Gaussian (auxiliary.h getRect semantics):
    returns x0, y0, x1, y1 (exclusive upper), clamped to the grid."""
    x0 = jnp.clip(((xy[:, 0] - radius) / tile_w).astype(jnp.int32), 0, n_tiles_x)
    y0 = jnp.clip(((xy[:, 1] - radius) / tile_h).astype(jnp.int32), 0, n_tiles_y)
    x1 = jnp.clip(((xy[:, 0] + radius + tile_w - 1) / tile_w).astype(jnp.int32),
                  0, n_tiles_x)
    y1 = jnp.clip(((xy[:, 1] + radius + tile_h - 1) / tile_h).astype(jnp.int32),
                  0, n_tiles_y)
    return x0, y0, x1, y1
