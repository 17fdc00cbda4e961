import jax.numpy as jnp
import numpy as np

from real2sim_eval_tpu.utils import sh as shlib


def random_dirs(rng, n):
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def reference_eval_sh(deg, sh, dirs):
    """Direct transcription of the PlenOctree accumulation formula
    (the reference's sim/utils/gs/sh_utils.py:55-110) in numpy, used as a
    golden oracle for our fused basis-matmul implementation."""
    C0, C1, C2, C3 = shlib.C0, shlib.C1, shlib.C2, shlib.C3
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4] + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7] + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result
                          + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


def test_eval_sh_matches_reference_formula(rng):
    dirs = random_dirs(rng, 32)
    for deg in range(4):
        k = (deg + 1) ** 2
        coeffs = rng.normal(size=(32, 16, 3)).astype(np.float32)
        ours = shlib.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs, jnp.float32))
        # reference formula treats sh as (..., C, K): transpose
        ref = reference_eval_sh(deg, coeffs.transpose(0, 2, 1), dirs)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_dc_only():
    sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
    out = shlib.eval_sh(0, sh, dirs)
    np.testing.assert_allclose(out, shlib.C0, atol=1e-6)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.random((10, 3)).astype(np.float32)
    back = shlib.sh_dc_to_rgb(shlib.rgb_to_sh_dc(jnp.asarray(rgb)))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_clamped_rgb_nonnegative(rng):
    sh = jnp.asarray(rng.normal(size=(64, 16, 3)) * 3, jnp.float32)
    dirs = jnp.asarray(random_dirs(rng, 64), jnp.float32)
    rgb = shlib.sh_to_rgb_clamped(3, sh, dirs)
    assert (np.asarray(rgb) >= 0).all()
