"""Fine-stream incremental renderer: exactness against the full fine
pipeline.

Contract (renderer/incremental_fine.py): re-compositing only the dirty
SUPERTILES (8 fine streams each, including fine tiles with no dynamic
pairs of their own) on top of cached static frames produces BITWISE the
same pixels as the full fine-kernel pipeline run on the scene
concatenated [dynamic; static] — the same clean-tile / merge-order
arguments as the wide incremental path, plus the zero-length-slot case
unique to supertile grouping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer.camera import setup_camera
from real2sim_eval_tpu.renderer.incremental_fine import (
    build_static_raster_fine, render_incremental_fine)
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
        "opacities": jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        "shs": jnp.asarray(rng.normal(scale=0.3, size=(n, 1, 3)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
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


# bitwise contract: unquantized payloads on both sides; fine budgets
# sized so nothing clamps
CFG = RasterConfig(backend="pallas", kernel="fine", interpret=True,
                   fine_pairs_factor=40.0, fine_small_tiles=6,
                   fine_max_tiles=128, max_large=4096,
                   pack_payloads=False)


def _full_reference(cam, w2c, static, dyn):
    """Full fine-kernel pipeline on the [dyn; static] concatenation."""
    B = dyn["means3D"].shape[0]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None],
                                  (B,) + static[k].shape)], axis=1)
        for k in static}
    return rasterize_batch([(cam, jnp.broadcast_to(
        jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))],
        scenes, 0, config=CFG)


def test_fine_incremental_matches_full(scene):
    cam, w2c, static, dyn = scene
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)

    st = build_static_raster_fine(cam, w2c, static, 0, CFG)
    assert st.max_seg > 0
    rgb_i, dep_i, tele = render_incremental_fine(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=32, p_mix=8192)

    assert tele.shape == (1, 3, 4)
    n_dirty = np.asarray(tele[0, :, 0])
    n_super = st.n_super_x * st.n_super_y
    assert (n_dirty > 0).all() and (n_dirty < n_super).all()
    assert (np.asarray(tele[0, :, 1:]) == 0).all(), "no drops expected"
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[0]), np.asarray(dep_f[0]))


def test_fine_chunked_matches_unchunked(scene):
    """merge_mem_budget chunking must be semantically invisible on the fine
    path too (shared chunked_incremental, fine pair-budget sizing)."""
    import dataclasses

    from real2sim_eval_tpu.renderer.incremental import merge_chunk_size

    cam, w2c, static, dyn = scene
    st = build_static_raster_fine(cam, w2c, static, 0, CFG)
    rgb_u, dep_u, tele_u = render_incremental_fine(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=32, p_mix=8192)
    small = dataclasses.replace(CFG, merge_mem_budget=1 << 20)
    assert merge_chunk_size(small, dyn["means3D"].shape[1], 8192, 3,
                            fine=True) < 3
    rgb_c, dep_c, tele_c = render_incremental_fine(
        [(cam, st, w2c)], dyn, 0, small, t_budget=32, p_mix=8192)
    # rgb: XLA fuses the merge arithmetic differently inside the lax.map
    # body (FMA contraction/reassociation) — a couple of f32 ulps, not a
    # semantic difference; depth (a selected value) and telemetry stay
    # exact
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_u),
                               atol=3e-7, rtol=0)
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_u))
    np.testing.assert_array_equal(np.asarray(tele_c), np.asarray(tele_u))


def test_fine_budget_overflow_reported(scene):
    cam, w2c, static, dyn = scene
    st = build_static_raster_fine(cam, w2c, static, 0, CFG)
    _, _, tele = render_incremental_fine(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=2, p_mix=8192)
    n_dirty = np.asarray(tele[0, :, 0])
    dropped = np.asarray(tele[0, :, 1])
    assert (dropped == np.maximum(n_dirty - 2, 0)).all()
    assert (dropped > 0).any(), "fixture should overflow a 2-supertile budget"


@pytest.mark.slow
def test_evaluator_fine_incremental_matches_wide(tmp_path):
    """End-to-end: BatchedEvaluator with kernel='fine' + incremental must
    track the wide incremental path within the 3-sigma rect tolerance
    (the fine pipeline crops splats at their 3-sigma fine rects like the
    CUDA reference's getRect; the wide kernel composites whole 128-px
    tile rows, so high-opacity splats differ on pixels just outside
    3 sigma — bounded well under the 2e-2 golden tolerance)."""
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.testing import (full_cfg, make_rope_points,
                                           make_synthetic_scene,
                                           write_fixture_checkpoint)

    rope = make_rope_points(n=60, length=0.3)
    write_fixture_checkpoint(tmp_path, "rope_test", rope, spring_Y=2e3)
    cams = [dict(type="side", h=64, w=256,
                 intr=[80.0, 0, 128.0, 0, 80.0, 32.0, 0, 0, 1],
                 c2w=[1, 0, 0, 0, 0, -1, 0, 0, 0, 0, -1, 1.5, 0, 0, 0, 1])]
    gs = make_synthetic_scene(tmp_path / "scans", rope_pts=rope,
                              ik_urdf=None, n_table=300)
    cfg = full_cfg(tmp_path, "rope_test", gs=gs, cameras=cams,
                   physics_over=dict(dt=2e-4, self_collision=False))
    outs = {}
    for kern in ("fine", "wide"):
        ev = BatchedEvaluator(
            cfg, episode_ids=[0, 1],
            raster_config=RasterConfig(backend="pallas", kernel=kern,
                                       interpret=True, incremental="on",
                                       pack_payloads=False))
        assert ev._incremental_debug is not None
        assert ev._incremental_debug["kind"] == kern
        ims, deps, _, _ = ev.render()
        outs[kern] = (np.asarray(ims), np.asarray(deps))
        drops = ev.render_drops()
        assert sum(drops.values()) == 0, drops
    d_rgb = np.abs(outs["fine"][0] - outs["wide"][0]).max()
    d_dep = np.abs(outs["fine"][1] - outs["wide"][1]).max()
    assert d_rgb < 2e-2 and d_dep < 1e-2, (d_rgb, d_dep)


def test_fine_clean_supertiles_keep_cache(scene):
    """Moving the object out of frame leaves every cached pixel intact."""
    cam, w2c, static, dyn = scene
    st = build_static_raster_fine(cam, w2c, static, 0, CFG)
    dyn_far = dict(dyn)
    dyn_far["means3D"] = dyn["means3D"] + jnp.asarray([5.0, 5.0, 0.0])
    rgb_b, dep_b, tele = render_incremental_fine([(cam, st, w2c)], dyn_far,
                                                 0, CFG)
    assert (np.asarray(tele[0, :, 0]) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(rgb_b[0, 0]), np.asarray(st.rgb_cache[:, :H, :W]).clip(0, 1))


def test_fine_packed_merge_matches_packed_full(scene):
    """Production (pack_payloads=True) contract for the fine family —
    same regression as test_incremental.test_packed_merge_bitwise_vs_
    packed_full: the merge sort keys on EXACT depths carried through
    bin_gaussians_fine's extra_lanes, so the packed incremental-fine
    path stays at f16-quantization distance from the packed full fine
    pipeline (order identical; values quantized once on either path)."""
    import dataclasses

    cam, w2c, static, dyn = scene
    cfg_p = dataclasses.replace(CFG, pack_payloads=True)
    B = dyn["means3D"].shape[0]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None],
                                  (B,) + static[k].shape)], axis=1)
        for k in static}
    rgb_fp, dep_fp = rasterize_batch([(cam, jnp.broadcast_to(
        jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))],
        scenes, 0, config=cfg_p)

    st = build_static_raster_fine(cam, w2c, static, 0, cfg_p)
    rgb_i, dep_i, tele = render_incremental_fine(
        [(cam, st, w2c)], dyn, 0, cfg_p, t_budget=32, p_mix=8192)
    assert (np.asarray(tele[0, :, 1:]) == 0).all(), "no drops expected"

    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)  # unpacked truth
    q = float(jnp.abs(rgb_fp[0] - rgb_f[0]).max())         # packing scale
    d = float(jnp.abs(rgb_i[0] - rgb_fp[0]).max())
    assert d <= q + 1e-7, (
        f"packed fine incremental diverges {d:.2e} from the packed full "
        f"fine pipeline (packing-inherent scale {q:.2e})")
    d_u = float(jnp.abs(rgb_i[0] - rgb_f[0]).max())
    assert d_u <= max(2.0 * q, 2e-3), f"{d_u:.2e} vs unpacked truth"
