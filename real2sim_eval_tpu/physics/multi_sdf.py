"""Stacked multi-collider SDF query.

TPU gathers serialize per row with ~10 us fixed cost per gather op, so the
contact path queries ALL colliders (fingers + statics) with ONE gather from
a concatenated corner table instead of one gather per collider per phase
(see physics/sdf.py for the per-grid corner packing). Grid dims are static,
so the per-collider cell arithmetic folds into one fused kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sdf import SdfGrid


def combine_grids(grids: tuple) -> dict:
    """Concatenate collider grids into one query table. Called inside jit
    (loop-invariant; XLA hoists it out of the substep scan)."""
    dims = np.array([g.values.shape for g in grids], np.int32)        # (C, 3)
    cells = (dims[:, 0] - 1) * (dims[:, 1] - 1) * (dims[:, 2] - 1)
    offsets = np.concatenate([[0], np.cumsum(cells)[:-1]]).astype(np.int32)
    return {
        "corners": jnp.concatenate([g.corners for g in grids], axis=0),
        "origin": jnp.stack([g.origin for g in grids]),               # (C, 3)
        "inv_spacing": jnp.stack([g.inv_spacing for g in grids]),     # (C,)
        "dims": dims,                                                  # static
        "cell_offset": jnp.asarray(offsets),
    }


def multi_sdf_query(combo: dict, pts_local: jax.Array):
    """Query C colliders at once.

    Args:
      combo: from combine_grids.
      pts_local: (C, N, 3) query points, already in each collider's frame.
    Returns:
      dist (C, N), normal_local (C, N, 3).
    """
    dims = combo["dims"]                                  # (C, 3) numpy
    ny1 = jnp.asarray(dims[:, 1] - 1)[:, None]
    nz1 = jnp.asarray(dims[:, 2] - 1)[:, None]
    hi = jnp.asarray(dims - 1, pts_local.dtype)[:, None, :]  # (C, 1, 3)

    u = (pts_local - combo["origin"][:, None]) * combo["inv_spacing"][:, None, None]
    inside = jnp.all((u >= 0.0) & (u <= hi), axis=-1)      # (C, N)
    u = jnp.clip(u, 0.0, hi - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    cell = ((i0[..., 0] * ny1 + i0[..., 1]) * nz1 + i0[..., 2]
            + combo["cell_offset"][:, None])
    corners = combo["corners"][cell]                       # (C, N, 8) 1 gather
    # last-axis slices (NOT moveaxis: that lowers to a real transpose copy
    # which breaks the surrounding elementwise fusion — a measurable extra
    # kernel inside the 667-substep loop)
    c000, c001, c010, c011 = (corners[..., 0], corners[..., 1],
                              corners[..., 2], corners[..., 3])
    c100, c101, c110, c111 = (corners[..., 4], corners[..., 5],
                              corners[..., 6], corners[..., 7])

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx
    dist = jnp.where(inside, val, 1e3)

    s = combo["inv_spacing"][:, None]
    gx = (c1 - c0) * s
    gy = ((c01 - c00) * (1 - fx) + (c11 - c10) * fx) * s
    gz = (((c001 - c000) * (1 - fy) + (c011 - c010) * fy) * (1 - fx)
          + ((c101 - c100) * (1 - fy) + (c111 - c110) * fy) * fx) * s
    grad = jnp.stack([gx, gy, gz], axis=-1)
    normal = grad / jnp.maximum(
        jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return dist, normal
