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

    # view/projection ------------------------------------------------------
    p_view = means3d @ w2c[:3, :3].T + w2c[:3, 3]
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
    R = tf.quat_to_rot(quats)
    S = scales * scale_modifier
    M = R * S[:, None, :]                       # columns scaled
    cov3d = M @ jnp.swapaxes(M, -1, -2)         # (N, 3, 3)

    # EWA cov2D (forward.cu:74-113) ---------------------------------------
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    txtz = jnp.clip(p_view[:, 0] / zs, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / zs, -limy, limy)
    tx = txtz * zs
    ty = tytz * zs
    tz = zs

    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], -1),
        jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], -1),
    ], axis=-2)                                  # (N, 2, 3)
    W = w2c[:3, :3]                              # view rotation
    T = J @ W                                    # (N, 2, 3)
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # (N, 2, 2)
    cov_a = cov2d[:, 0, 0] + 0.3
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + 0.3

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
