"""Signed-distance-field collision geometry.

TPU-native replacement for NVIDIA Warp's BVH point queries
(``wp.mesh_query_point_sign_winding_number`` + per-substep ``mesh.refit()``,
reference: sim/physics/spring_mass_warp.py:322-323,397-398,887-899). A BVH
walk is irregular, data-dependent control flow — hostile to XLA. Instead we
precompute a dense SDF grid per collision mesh **once at reset** (host-side
numpy) and query it in the jitted substep with a trilinear gather, which is
dense, branch-free, and batches over particles and environments.

Dynamic meshes (gripper fingers) are handled by storing the SDF in the
*link-local* frame and transforming query points by the finger's inverse
pose each substep — equivalent to the reference's re-fitting of moved
vertices, but O(1) instead of O(V).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..utils.mesh import TriMesh


@struct.dataclass
class SdfGrid:
    """Dense SDF sampled on a regular grid (jittable pytree).

    ``corners`` pre-packs each cell's 8 corner values contiguously so a
    trilinear query needs ONE gather of N rows (TPU gathers serialize per
    row; packing trades 8x memory for 8x fewer gathered rows in the
    innermost physics loop)."""

    origin: jax.Array      # (3,) world/link-frame position of voxel (0,0,0)
    inv_spacing: jax.Array  # () 1/voxel size
    values: jax.Array      # (nx, ny, nz) signed distance, f32
    corners: jax.Array     # ((nx-1)*(ny-1)*(nz-1), 8) packed cell corners
    # packed 4^3 blocks for the fused Pallas step's per-chunk patch fetch
    # (see pack_blocks4); None when built by hand in tests
    blocks4: jax.Array | None = None

    @property
    def shape(self):
        return self.values.shape


def _pack_corners(values: np.ndarray) -> np.ndarray:
    v = np.asarray(values)
    c = np.stack([
        v[:-1, :-1, :-1], v[:-1, :-1, 1:], v[:-1, 1:, :-1], v[:-1, 1:, 1:],
        v[1:, :-1, :-1], v[1:, :-1, 1:], v[1:, 1:, :-1], v[1:, 1:, 1:],
    ], axis=-1)
    return c.reshape(-1, 8).astype(np.float32)


def pack_blocks4(values: np.ndarray) -> np.ndarray:
    """Pack every 4x4x4 block of the grid into one contiguous 64-value row.

    The fused Pallas physics step (physics/pallas_step.py) re-fetches, once
    per substep-chunk, a local 4^3 SDF patch per contact particle; with this
    table the fetch is ONE gathered row per (particle, collider) instead of
    16+ strided rows (TPU gathers cost per ROW, so contiguity is everything).
    Grids smaller than 4 along an axis are edge-padded.
    Returns ((nx-3)*(ny-3)*(nz-3), 64) float32 for the padded dims.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    v = np.asarray(values, np.float32)
    pad = [(0, max(0, 4 - s)) for s in v.shape]
    if any(p[1] for p in pad):
        v = np.pad(v, pad, mode="edge")
    w = sliding_window_view(v, (4, 4, 4))
    return np.ascontiguousarray(w.reshape(-1, 64)).astype(np.float32)


def blocks4_dims(values_shape) -> tuple[int, int, int]:
    """Grid dims after the >=4 edge-padding pack_blocks4 applies."""
    return tuple(max(int(s), 4) for s in values_shape)


def build_sdf_grid(
    mesh: TriMesh,
    voxel_size: float = 0.0025,
    padding: float = 0.015,
    n_surface_samples: int = 60000,
    max_dim: int = 96,
) -> SdfGrid:
    """Voxelize a mesh's signed distance on the host.

    Unsigned distance comes from a KD-tree over dense surface samples; the
    sign from the dot product with the nearest sample's face normal (robust
    for the watertight-ish collision hulls the reference uses, and the
    contact margin of 1-5 mm, spring_mass_warp.py:344-347, tolerates small
    sign noise near edges).
    """
    from scipy.spatial import cKDTree

    lo, hi = mesh.bounds()
    lo = lo - padding
    hi = hi + padding
    extent = hi - lo
    dims = np.maximum(np.ceil(extent / voxel_size).astype(int) + 1, 2)
    if dims.max() > max_dim:
        voxel_size = float(extent.max() / (max_dim - 1))
        dims = np.maximum(np.ceil(extent / voxel_size).astype(int) + 1, 2)

    pts, normals = mesh.sample_surface(
        n_surface_samples, np.random.default_rng(0), return_normals=True
    )
    # include mesh vertices to catch thin features missed by area sampling
    vert_normals = _vertex_normals(mesh)
    pts = np.concatenate([pts, mesh.vertices.astype(np.float32)], axis=0)
    normals = np.concatenate([normals, vert_normals], axis=0)

    tree = cKDTree(pts)
    gx, gy, gz = [np.arange(d) * voxel_size + lo[i] for i, d in enumerate(dims)]
    grid = np.stack(np.meshgrid(gx, gy, gz, indexing="ij"), axis=-1).reshape(-1, 3)
    dist, idx = tree.query(grid, k=1, workers=-1)
    delta = grid - pts[idx]
    sign = np.where(np.einsum("nd,nd->n", delta, normals[idx]) >= 0.0, 1.0, -1.0)
    sdf = (dist * sign).astype(np.float32).reshape(tuple(dims))

    return SdfGrid(
        origin=jnp.asarray(lo, jnp.float32),
        inv_spacing=jnp.asarray(1.0 / voxel_size, jnp.float32),
        values=jnp.asarray(sdf),
        corners=jnp.asarray(_pack_corners(sdf)),
        blocks4=jnp.asarray(pack_blocks4(sdf)),
    )


def _vertex_normals(mesh: TriMesh) -> np.ndarray:
    fn = mesh.face_normals()
    vn = np.zeros_like(mesh.vertices, dtype=np.float64)
    for k in range(3):
        np.add.at(vn, mesh.faces[:, k], fn)
    n = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(n, 1e-12)).astype(np.float32)


def sdf_query(grid: SdfGrid, pts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Trilinear SDF value + analytic trilinear gradient at query points.

    TPU note: this is the innermost hot op of the contact path (called per
    collider per substep). All eight cell corners come from ONE flattened
    gather, and the normal is the exact gradient of the trilinear
    interpolant computed from those same corners — no extra samples. (An
    earlier finite-difference version issued 7x8 separate 3-axis gathers;
    TPU gathers are expensive enough that this dominated the whole physics
    step.)

    Args:
      grid: SdfGrid (in its own frame).
      pts: (..., 3) query points in the grid's frame.
    Returns:
      (dist, normal): (...,) signed distance and (..., 3) unit outward normal.
      Points outside the grid return a large positive distance (no contact).
    """
    nx, ny, nz = grid.values.shape

    u = (pts - grid.origin) * grid.inv_spacing
    inside = (jnp.all(u >= 0.0, axis=-1)
              & (u[..., 0] <= nx - 1) & (u[..., 1] <= ny - 1)
              & (u[..., 2] <= nz - 1))
    u = jnp.clip(u, 0.0, jnp.asarray([nx - 1, ny - 1, nz - 1], u.dtype) - 1e-4)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    cell = (i0[..., 0] * (ny - 1) + i0[..., 1]) * (nz - 1) + i0[..., 2]
    corners = grid.corners[cell]                    # (..., 8) one N-row gather
    # last-axis slices, not moveaxis (a transpose copy breaks fusion)
    c000, c001, c010, c011 = (corners[..., 0], corners[..., 1],
                              corners[..., 2], corners[..., 3])
    c100, c101, c110, c111 = (corners[..., 4], corners[..., 5],
                              corners[..., 6], corners[..., 7])

    # value
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx
    d = jnp.where(inside, val, 1e3)

    # exact gradient of the trilinear interpolant (same 8 corners)
    s = grid.inv_spacing
    gx = (c1 - c0) * s
    gy = ((c01 - c00) * (1 - fx) + (c11 - c10) * fx) * s
    gz = (((c001 - c000) * (1 - fy) + (c011 - c010) * fy) * (1 - fx)
          + ((c101 - c100) * (1 - fy) + (c111 - c110) * fy) * fx) * s
    grad = jnp.stack([gx, gy, gz], axis=-1)
    normal = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
    return d, normal
