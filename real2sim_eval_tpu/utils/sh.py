"""Real spherical-harmonics evaluation for Gaussian-splat view-dependent color.

Functional parity with the reference's PlenOctree-derived table
(reference: sim/utils/gs/sh_utils.py:24-118 and the CUDA twin in
third-party/diff-gaussian-rasterization-w-depth/cuda_rasterizer/forward.cu:20-71),
re-expressed as a single fused basis-matmul so XLA can batch it over all
Gaussians: we build the SH basis vector per direction and contract it against
the coefficient tensor with one einsum instead of the reference's accumulation
chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_basis(dirs: jax.Array, deg: int) -> jax.Array:
    """SH basis values for unit directions.

    Args:
      dirs: (..., 3) unit directions.
      deg: max SH degree, 0..3.
    Returns:
      (..., (deg+1)**2) basis values.
    """
    assert 0 <= deg <= 3
    ones = jnp.ones_like(dirs[..., 0])
    basis = [C0 * ones]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        basis += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
    return jnp.stack(basis, axis=-1)


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH color.

    Args:
      deg: SH degree 0..3.
      sh: (..., K, C) coefficients with K >= (deg+1)**2 (DC first).
      dirs: (..., 3) unit view directions.
    Returns:
      (..., C) raw SH color (no +0.5 offset).
    """
    k = (deg + 1) ** 2
    basis = sh_basis(dirs, deg)  # (..., k)
    return jnp.einsum("...k,...kc->...c", basis, sh[..., :k, :])


def sh_to_rgb_clamped(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """SH -> RGB with the rasterizer's +0.5 offset and clamp-at-zero
    (reference: forward.cu:63-70)."""
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / C0


def sh_dc_to_rgb(sh_dc: jax.Array) -> jax.Array:
    return sh_dc * C0 + 0.5
