"""Differentiable rasterizer tests (renderer/diff.py).

Ground truth for gradients is ``jax.grad`` THROUGH the dense reference
compositor (raster._composite_reference) — an independent implementation
of the same forward.cu:262-394 semantics that jax differentiates
mechanically, against which the hand-derived Pallas backward (the
prefix/suffix re-walk, diff.py docstring) must agree. A finite-difference
spot check guards against both paths sharing a systematic error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer.camera import Camera
from real2sim_eval_tpu.renderer.diff import rasterize_diff
from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians
from real2sim_eval_tpu.renderer.raster import (RasterConfig, TILE_W,
                                               _composite_reference)

CFG = RasterConfig(interpret=True)


def small_cam(w=256, h=16, f=40.0):
    return Camera(width=w, height=h, fx=f, fy=f, cx=w / 2, cy=h / 2,
                  z_threshold=0.05)


def make_scene(rng, n=60, opac_range=(0.2, 0.9)):
    means = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.0, 3.0, n)
    scales = rng.uniform(0.02, 0.10, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(*opac_range, n).astype(np.float32)
    shs = (rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))


def dense_render(cam, w2c, means, scales, quats, opac, shs, bg):
    pre = preprocess_gaussians(cam, w2c, means, scales, quats, opac, shs, 0)
    return _composite_reference(cam, pre, jnp.asarray(bg, jnp.float32),
                                bin_w=TILE_W)


def loss_weights(rng, cam):
    wr = jnp.asarray(rng.normal(size=(3, cam.height, cam.width)), jnp.float32)
    wd = jnp.asarray(rng.normal(size=(cam.height, cam.width)), jnp.float32)
    return wr, wd


class TestDiffForward:
    def test_matches_dense(self, rng):
        cam = small_cam()
        w2c = jnp.eye(4)
        scene = make_scene(rng)
        bg = (0.1, 0.2, 0.3)
        rgb_d, dep_d = dense_render(cam, w2c, *scene, bg)
        rgb_p, dep_p = rasterize_diff(cam, w2c, *scene, 0, bg=bg, config=CFG)
        np.testing.assert_allclose(rgb_p, rgb_d, atol=2e-5)
        np.testing.assert_allclose(dep_p, dep_d, atol=2e-5)


class TestDiffDrops:
    @pytest.mark.slow
    def test_drop_counter(self, rng):
        cam = small_cam()
        w2c = jnp.eye(4)
        scene = make_scene(rng)
        _, _, d0 = rasterize_diff(cam, w2c, *scene, 0, config=CFG,
                                  return_drops=True)
        assert int(d0) == 0
        starved = RasterConfig(interpret=True, max_pairs_override=8,
                               small_tiles=1, max_tiles_per_gaussian=1)
        _, _, d1 = rasterize_diff(cam, w2c, *scene, 0, config=starved,
                                  return_drops=True)
        assert int(d1) > 0


class TestDiffGradients:
    def _compare(self, rng, scene, bg=(0.05, 0.0, 0.1), rtol=2e-3,
                 atol=None):
        cam = small_cam()
        w2c = jnp.eye(4)
        wr, wd = loss_weights(rng, cam)

        def loss_diff(means, scales, quats, opac, shs):
            rgb, dep = rasterize_diff(cam, w2c, means, scales, quats, opac,
                                      shs, 0, bg=bg, config=CFG)
            return jnp.sum(rgb * wr) + 0.1 * jnp.sum(dep * wd)

        def loss_dense(means, scales, quats, opac, shs):
            rgb, dep = dense_render(cam, w2c, means, scales, quats, opac,
                                    shs, bg)
            return jnp.sum(rgb * wr) + 0.1 * jnp.sum(dep * wd)

        g_diff = jax.grad(loss_diff, argnums=(0, 1, 2, 3, 4))(*scene)
        g_dense = jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4))(*scene)
        names = ["means3d", "scales", "quats", "opacities", "shs"]
        for name, a, b in zip(names, g_diff, g_dense):
            a, b = np.asarray(a), np.asarray(b)
            tol = atol if atol is not None else 1e-4 * max(
                np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=rtol, atol=tol,
                                       err_msg=f"grad mismatch: {name}")

    def test_grads_match_dense_small(self, rng):
        # fast-lane smoke: a handful of splats still walks every backward
        # path (prefix/suffix re-walk, depth term, bg term); the full-size
        # comparison rides the slow lane
        self._compare(rng, make_scene(rng, n=10))

    @pytest.mark.slow
    def test_grads_match_dense(self, rng):
        self._compare(rng, make_scene(rng))

    @pytest.mark.slow
    def test_grads_opaque_early_termination(self, rng):
        # near-opaque stacked splats drive pixels through the T<1e-4
        # freeze and the 0.99 alpha clamp — the gated-subgradient paths
        scene = make_scene(rng, n=80, opac_range=(0.95, 1.0))
        self._compare(rng, scene)

    @pytest.mark.slow
    def test_finite_difference_opacity(self, rng):
        cam = small_cam()
        w2c = jnp.eye(4)
        scene = make_scene(rng, n=20)
        wr, wd = loss_weights(rng, cam)

        def loss(opac):
            rgb, _ = rasterize_diff(cam, w2c, scene[0], scene[1], scene[2],
                                    opac, scene[4], 0, config=CFG)
            return jnp.sum(rgb * wr)

        opac = scene[3]
        g = jax.grad(loss)(opac)
        eps = 1e-3
        for i in [0, 7, 13]:
            lp = loss(opac.at[i].add(eps))
            lm = loss(opac.at[i].add(-eps))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-3)

    @pytest.mark.slow
    def test_depth_grad_selects_crossing_pair(self, rng):
        # one opaque splat in front of another: the median-depth gradient
        # must land ONLY on the front (T=0.5-crossing) gaussian
        cam = small_cam()
        w2c = jnp.eye(4)
        means = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]], jnp.float32)
        scales = jnp.full((2, 3), 0.08, jnp.float32)
        quats = jnp.asarray([[1, 0, 0, 0], [1, 0, 0, 0]], jnp.float32)
        opac = jnp.asarray([0.95, 0.95], jnp.float32)
        shs = jnp.zeros((2, 1, 3), jnp.float32)

        def loss(means):
            _, dep = rasterize_diff(cam, w2c, means, scales, quats, opac,
                                    shs, 0, config=CFG)
            return jnp.sum(dep)

        def loss_dense(means):
            _, dep = dense_render(cam, w2c, means, scales, quats, opac, shs,
                                  (0.0, 0.0, 0.0))
            return jnp.sum(dep)

        g = jax.grad(loss)(means)
        g_dense = jax.grad(loss_dense)(means)
        np.testing.assert_allclose(g, g_dense, rtol=1e-4, atol=1e-5)
        # the front gaussian crosses T=0.5 on the central pixels, so the
        # bulk of the depth gradient mass lands on its z
        assert abs(float(g[0, 2])) > abs(float(g[1, 2]))
        assert abs(float(g[0, 2])) > 1.0
