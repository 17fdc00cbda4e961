"""Stream-merge incremental renderer: exactness against the full pipeline.

The contract under test (renderer/incremental.py _render_incremental_stream
+ tile_kernel._composite_merge_scoped): two-pointer-merging each dirty
tile's frozen static segment with its per-step dynamic segment INSIDE the
sparse compositor produces BITWISE the same pixels as the full batched
pipeline on the [dynamic; static] concatenation (unpacked payloads) —
the in-kernel tie rule (dynamic head wins at equal depth, streams stay
sequential) IS the full sort's stable depth-argsort order. Unlike the
sort path there is no static-fill budget: telemetry lane 2 is constant 0.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer.camera import setup_camera
from real2sim_eval_tpu.renderer.incremental import (build_static_raster,
                                                    render_incremental)
from real2sim_eval_tpu.renderer.raster import RasterConfig, rasterize_batch

H, W = 64, 128


def _cam():
    k = np.array([[160.0, 0, W / 2], [0, 160.0, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.0, 0.0, -1.2]
    return setup_camera(W, H, k, np.linalg.inv(c2w))


def _gaussians(rng, n, center, spread, scale=0.02):
    means = (center + rng.normal(scale=spread, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return {
        "means3D": jnp.asarray(means),
        "scales": jnp.full((n, 3), scale, jnp.float32),
        "rotations": jnp.asarray(quats),
        "opacities": jnp.asarray(
            rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        "shs": jnp.asarray(
            rng.normal(scale=0.3, size=(n, 1, 3)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    cam, w2c = _cam()
    static = _gaussians(rng, 400, np.array([0.0, 0.0, 0.3]), 0.45)
    B = 3
    dyn = {k: jnp.stack([v] * B) for k, v in
           _gaussians(rng, 40, np.array([0.05, 0.0, 0.1]), 0.05).items()}
    shift = jnp.asarray(np.stack([np.array([0.0, 0.0, 0.0]),
                                  np.array([-0.15, 0.2, 0.0]),
                                  np.array([0.12, -0.25, 0.05])],
                                 0).astype(np.float32))
    dyn["means3D"] = dyn["means3D"] + shift[:, None]
    return cam, w2c, static, dyn


# bitwise tests run unpacked (see test_incremental.py's CFG note)
CFG = RasterConfig(backend="pallas", interpret=True, max_pairs_factor=10.0,
                   max_tiles_per_gaussian=32, max_large=4096,
                   pack_payloads=False, merge_kernel="stream")


def _full_reference(cam, w2c, static, dyn, cfg=CFG):
    B = dyn["means3D"].shape[0]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None],
                                  (B,) + static[k].shape)], axis=1)
        for k in static}
    return rasterize_batch([(cam, jnp.broadcast_to(
        jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))],
        scenes, 0, config=cfg)


def test_stream_matches_full(scene):
    cam, w2c, static, dyn = scene
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)

    st = build_static_raster(cam, w2c, static, 0, CFG)
    assert st.max_seg > 0
    rgb_i, dep_i, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96)

    assert tele.shape == (1, 3, 4)
    n_dirty = np.asarray(tele[0, :, 0])
    assert (n_dirty > 0).all()
    assert (n_dirty < st.n_tiles_x * st.n_tiles_y).all()
    assert (np.asarray(tele[0, :, 1:]) == 0).all(), "no drops expected"
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[0]), np.asarray(dep_f[0]))


def test_stream_two_cameras(scene):
    """Exercises the concatenated static tables' per-camera pair offsets."""
    cam, w2c, static, dyn = scene
    w2c2 = np.array(w2c, np.float32).copy()
    w2c2[0, 3] += 0.15
    st1 = build_static_raster(cam, w2c, static, 0, CFG)
    st2 = build_static_raster(cam, w2c2, static, 0, CFG)
    rgb_i, dep_i, _ = render_incremental(
        [(cam, st1, w2c), (cam, st2, w2c2)], dyn, 0, CFG, t_budget=96)
    rgb1, dep1 = _full_reference(cam, w2c, static, dyn)
    rgb2, dep2 = _full_reference(cam, w2c2, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb1[0]))
    np.testing.assert_array_equal(np.asarray(rgb_i[1]), np.asarray(rgb2[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[1]), np.asarray(dep2[0]))


def test_stream_small_chunks_refill(scene):
    """Force many in-kernel chunk refills (chunk=64 -> 8-row windows):
    the on-demand sequential DMA of both streams must not change pixels."""
    cam, w2c, static, dyn = scene
    cfg = dataclasses.replace(CFG, chunk=64)
    st = build_static_raster(cam, w2c, static, 0, cfg)
    rgb_a, dep_a, _ = render_incremental(
        [(cam, st, w2c)], dyn, 0, cfg, t_budget=96)
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_a[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_a[0]), np.asarray(dep_f[0]))


def test_stream_dyn_deeper_than_all_static(scene):
    """A dynamic pair DEEPER than every static pair of its tile must
    composite at the segment end (static stream exhausts first — its
    head depth becomes +inf)."""
    cam, w2c, static, dyn = scene
    dyn_deep = dict(dyn)
    B = dyn["means3D"].shape[0]
    deep = _gaussians(np.random.default_rng(11), 8,
                      np.array([0.0, 0.0, 0.9]), 0.02, scale=0.05)
    dyn_deep = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(deep[k][None], (B,) + deep[k].shape)],
        axis=1) for k in dyn}
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_i, dep_i, tele = render_incremental(
        [(cam, st, w2c)], dyn_deep, 0, CFG, t_budget=96)
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn_deep)
    assert (np.asarray(tele[0, :, 1:]) == 0).all()
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[0]), np.asarray(dep_f[0]))


def test_stream_packed_close_to_unpacked(scene):
    """pack_payloads quantizes the DYNAMIC value lanes to f16 (the static
    table stays f32 — unlike the sort path, nothing re-packs it); the
    in-kernel merge keys on exact f32 depths either way, so order holds
    and pixels stay within the f16 value tolerance."""
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_u, dep_u, _ = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96)
    cfg_p = dataclasses.replace(CFG, pack_payloads=True)
    rgb_p, dep_p, _ = render_incremental(
        [(cam, st, w2c)], dyn, 0, cfg_p, t_budget=96)
    assert float(jnp.max(jnp.abs(rgb_p - rgb_u))) <= 1.5 / 255.0
    d_err = jnp.abs(dep_p - dep_u)
    assert float(jnp.quantile(d_err, 0.999)) <= 1e-2


def test_stream_matches_sort_path(scene):
    """Both merge strategies implement the same pixel contract — bitwise
    identical to each other when unpacked."""
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_s, dep_s, tele_s = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96)
    cfg_sort = dataclasses.replace(CFG, merge_kernel="sort")
    rgb_o, dep_o, tele_o = render_incremental(
        [(cam, st, w2c)], dyn, 0, cfg_sort, t_budget=96, p_mix=8192)
    np.testing.assert_array_equal(np.asarray(rgb_s), np.asarray(rgb_o))
    np.testing.assert_array_equal(np.asarray(dep_s), np.asarray(dep_o))
    np.testing.assert_array_equal(np.asarray(tele_s[..., :2]),
                                  np.asarray(tele_o[..., :2]))


def test_stream_clean_tiles_keep_cache(scene):
    """Clean tiles must pass the cached static pixels through untouched."""
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_i, _, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96)
    rgb_static = np.asarray(st.rgb_cache[:, :H, :W])
    rgb_full, _ = _full_reference(cam, w2c, static, dyn)
    changed = (np.asarray(rgb_i[0, 0]) != np.asarray(
        jnp.clip(jnp.broadcast_to(jnp.asarray(rgb_static)[None],
                                  rgb_i[0].shape), 0, 1))).any(axis=1)
    # some pixels changed (the dynamic object renders), not all
    assert changed.any() and not changed.all()
