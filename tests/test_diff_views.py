"""Multi-view differentiable rasterization (rasterize_diff_views): one
compositor launch over C views must match per-view rasterize_diff in both
pixels and scene-parameter gradients (which sum over views)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer.diff import rasterize_diff, rasterize_diff_views
from test_diff import CFG, loss_weights, make_scene, small_cam


def make_w2cs():
    w2c1 = np.eye(4, dtype=np.float32)
    w2c2 = np.eye(4, dtype=np.float32)
    w2c2[0, 3] = 0.2
    w2c3 = np.eye(4, dtype=np.float32)
    w2c3[1, 3] = -0.1
    return np.stack([w2c1, w2c2, w2c3])


def test_views_forward_matches_per_view(rng):
    cam = small_cam()
    scene = make_scene(rng)
    w2cs = make_w2cs()
    bg = (0.1, 0.0, 0.2)
    rgb_b, dep_b, drops = rasterize_diff_views(cam, w2cs, *scene, 0, bg=bg,
                                               config=CFG, return_drops=True)
    assert drops.shape == (3,) and int(drops.sum()) == 0
    for i in range(3):
        rgb_i, dep_i = rasterize_diff(cam, jnp.asarray(w2cs[i]), *scene, 0,
                                      bg=bg, config=CFG)
        np.testing.assert_allclose(rgb_b[i], rgb_i, atol=1e-6)
        np.testing.assert_allclose(dep_b[i], dep_i, atol=1e-6)


@pytest.mark.slow
def test_views_grads_sum_over_views(rng):
    cam = small_cam()
    scene = make_scene(rng, n=40)
    w2cs = make_w2cs()
    wr, wd = loss_weights(rng, cam)

    def loss_batched(means, opac):
        rgb, dep = rasterize_diff_views(cam, w2cs, means, scene[1], scene[2],
                                        opac, scene[4], 0, config=CFG)
        return jnp.sum(rgb * wr[None]) + 0.1 * jnp.sum(dep * wd[None])

    def loss_looped(means, opac):
        tot = 0.0
        for i in range(3):
            rgb, dep = rasterize_diff(cam, jnp.asarray(w2cs[i]), means,
                                      scene[1], scene[2], opac, scene[4], 0,
                                      config=CFG)
            tot = tot + jnp.sum(rgb * wr) + 0.1 * jnp.sum(dep * wd)
        return tot

    gb = jax.grad(loss_batched, argnums=(0, 1))(scene[0], scene[3])
    gl = jax.grad(loss_looped, argnums=(0, 1))(scene[0], scene[3])
    for a, b in zip(gb, gl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
