"""Incremental (dirty-tile) renderer: exactness against the full pipeline.

The contract under test (renderer/incremental.py): rendering only the
dirty tiles on top of the cached static composite produces BITWISE the
same pixels as the full batched pipeline run on the scene concatenated
[dynamic; static] — clean tiles because their pair set is identical to
the static-only render, dirty tiles because the merge reproduces the
full sort's pair order (dynamic-before-static on equal depth matches the
stable argsort of the [dyn; static] concat).
"""

import jax
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
        "opacities": jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        "shs": jnp.asarray(rng.normal(scale=0.3, size=(n, 1, 3)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    cam, w2c = _cam()
    static = _gaussians(rng, 400, np.array([0.0, 0.0, 0.3]), 0.45)
    B = 3
    dyn = {k: jnp.stack([v] * B) for k, v in
           _gaussians(rng, 40, np.array([0.05, 0.0, 0.1]), 0.05).items()}
    # env-varying dynamic positions (distinct dirty tiles per env; shifts
    # spread in y too — wide tiles are 8px rows, so vertical spread is
    # what multiplies dirty-tile counts at this width)
    shift = jnp.asarray(np.stack([np.array([0.0, 0.0, 0.0]),
                                  np.array([-0.15, 0.2, 0.0]),
                                  np.array([0.12, -0.25, 0.05])],
                                 0).astype(np.float32))
    dyn["means3D"] = dyn["means3D"] + shift[:, None]
    return cam, w2c, static, dyn


# pack_payloads off: these tests assert BITWISE equality between the
# incremental path (always unpacked — see incremental.py) and the full
# pipeline, so the full side must stay unquantized too
CFG = RasterConfig(backend="pallas", interpret=True, max_pairs_factor=10.0,
                   max_tiles_per_gaussian=32, max_large=4096,
                   pack_payloads=False)


def _full_reference(cam, w2c, static, dyn):
    """Full batched pipeline on the [dyn; static] concatenation."""
    B = dyn["means3D"].shape[0]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None],
                                  (B,) + static[k].shape)], axis=1)
        for k in static}
    return rasterize_batch([(cam, jnp.broadcast_to(
        jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))],
        scenes, 0, config=CFG)


def test_incremental_matches_full(scene):
    cam, w2c, static, dyn = scene
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)

    st = build_static_raster(cam, w2c, static, 0, CFG)
    assert st.max_seg > 0
    rgb_i, dep_i, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96, p_mix=8192)

    assert tele.shape == (1, 3, 4)
    n_dirty = np.asarray(tele[0, :, 0])
    assert (n_dirty > 0).all() and (n_dirty < st.n_tiles_x * st.n_tiles_y).all()
    assert (np.asarray(tele[0, :, 1:]) == 0).all(), "no drops expected"
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[0]), np.asarray(dep_f[0]))


def test_incremental_two_cameras(scene):
    cam, w2c, static, dyn = scene
    w2c2 = np.array(w2c, np.float32).copy()
    w2c2[0, 3] += 0.15
    st1 = build_static_raster(cam, w2c, static, 0, CFG)
    st2 = build_static_raster(cam, w2c2, static, 0, CFG)
    rgb_i, dep_i, _ = render_incremental(
        [(cam, st1, w2c), (cam, st2, w2c2)], dyn, 0, CFG,
        t_budget=96, p_mix=8192)
    rgb1, dep1 = _full_reference(cam, w2c, static, dyn)
    rgb2, dep2 = _full_reference(cam, w2c2, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb1[0]))
    np.testing.assert_array_equal(np.asarray(rgb_i[1]), np.asarray(rgb2[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[1]), np.asarray(dep2[0]))


def test_merge_dyn_deeper_than_all_static(scene):
    """Regression (round 4): a dynamic pair DEEPER than every static pair
    of its tile must insert at the segment end. The unrolled merge binary
    search kept probing after lo == hi == ends, read the NEXT tile's
    first (shallower) depth, and walked the insert past the segment —
    shifting out_j and corrupting the next slot's first rows. Surfaced by
    scan-scale objects whose deepest splats sink below a flat table whose
    static pairs all tie at one depth."""
    cam, w2c, _, _ = scene
    rng = np.random.default_rng(9)
    # flat static plane: every static pair at EXACTLY the same depth so
    # a converged search probes ties in the adjacent tile's stream
    nx, ny = 40, 10
    gx, gy = np.meshgrid(np.linspace(-0.35, 0.35, nx),
                         np.linspace(-0.18, 0.18, ny))
    plane = np.stack([gx.ravel(), gy.ravel(), np.zeros(nx * ny)], -1)
    static = _gaussians(rng, nx * ny, np.zeros(3), 0.0)
    static["means3D"] = jnp.asarray(plane, jnp.float32)
    B = 2
    dyn1 = _gaussians(rng, 30, np.array([0.0, 0.0, 0.0]), 0.04)
    # sink the dynamic splats BELOW the plane (deeper than all statics)
    dyn1["means3D"] = dyn1["means3D"] + jnp.asarray([0.0, 0.0, 0.03])
    dyn = {k: jnp.stack([v] * B) for k, v in dyn1.items()}
    dyn["means3D"] = dyn["means3D"] + jnp.asarray(
        [[0.0, 0.0, 0.0], [0.1, 0.05, 0.01]], jnp.float32)[:, None]

    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_i, dep_i, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96, p_mix=8192)
    assert (np.asarray(tele[0, :, 1:]) == 0).all()
    np.testing.assert_array_equal(np.asarray(rgb_i[0]), np.asarray(rgb_f[0]))
    np.testing.assert_array_equal(np.asarray(dep_i[0]), np.asarray(dep_f[0]))


def test_chunked_matches_unchunked(scene):
    """Memory-bounded instance chunking (merge_mem_budget) must be
    semantically invisible: a tiny budget forces lax.map env chunks (incl. a
    padded tail) through merge+composite, same pixels as one launch."""
    import dataclasses

    from real2sim_eval_tpu.renderer.incremental import merge_chunk_size

    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_u, dep_u, tele_u = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96, p_mix=8192)
    small = dataclasses.replace(CFG, merge_mem_budget=1 << 20)
    # B=3 with chunk 1 exercises the padded tail (Bp=3, chunk=1 -> exact;
    # force chunk 2 for a ragged tail instead)
    n_dyn = dyn["means3D"].shape[1]
    assert merge_chunk_size(small, n_dyn, 8192, 3) < 3
    rgb_c, dep_c, tele_c = render_incremental(
        [(cam, st, w2c)], dyn, 0, small, t_budget=96, p_mix=8192)
    # rgb: XLA fuses the merge arithmetic differently inside the lax.map
    # body (FMA contraction/reassociation) — a couple of f32 ulps, not a
    # semantic difference; depth (a selected value) and telemetry stay
    # exact
    np.testing.assert_allclose(np.asarray(rgb_c), np.asarray(rgb_u),
                               atol=3e-7, rtol=0)
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_u))
    np.testing.assert_array_equal(np.asarray(tele_c), np.asarray(tele_u))


def test_incremental_packed_close(scene):
    """Production default packs 8 of the 10 payload lanes to f16 through
    the binning AND merge sorts (pack_sort in incremental._merge_core).
    The merge tie rule is key-order exact either way (keys stay f32/i32);
    only attr values quantize (~5e-4 relative), so packed pixels must stay
    within 1/255 rgb of the unpacked exactness path and telemetry must be
    identical."""
    import dataclasses

    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_u, dep_u, tele_u = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96, p_mix=8192)
    packed = dataclasses.replace(CFG, pack_payloads=True)
    rgb_p, dep_p, tele_p = render_incremental(
        [(cam, st, w2c)], dyn, 0, packed, t_budget=96, p_mix=8192)
    np.testing.assert_array_equal(np.asarray(tele_p), np.asarray(tele_u))
    assert float(jnp.abs(rgb_p - rgb_u).max()) <= 1.0 / 255.0
    # median depth is DISCONTINUOUS in alpha: a pixel whose transmittance
    # lands exactly at the T=0.5 crossing can flip between a recorded
    # depth and the 15.0 default under any quantization (same rule as
    # test_raster.TestPacked). Rare flips allowed; the bulk holds 1e-2.
    d_dep = np.abs(np.asarray(dep_p - dep_u))
    n_flip = int((d_dep > 1e-2).sum())
    assert n_flip <= max(5, int(2e-4 * d_dep.size)), \
        (n_flip, float(d_dep.max()))


def test_budget_overflow_reported(scene):
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    _, _, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=2, p_mix=8192)
    n_dirty = np.asarray(tele[0, :, 0])
    dropped = np.asarray(tele[0, :, 1])
    assert (dropped == np.maximum(n_dirty - 2, 0)).all()
    assert (dropped > 0).any(), "fixture should overflow a 2-tile budget"


def test_static_fill_overflow_reported(scene):
    """p_mix now budgets the STATIC FILL of the merge sort (dynamic pairs
    are bounded by their binning buffer): an undersized fill budget must
    report its drop count in telemetry lane 2, never silently
    under-compose."""
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    _, _, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, CFG, t_budget=96, p_mix=64)
    dropped = np.asarray(tele[0, :, 2])
    assert (dropped > 0).any(), \
        "fixture's dirty-tile static fill should overflow a 64-row budget"


def test_clean_tiles_keep_cache(scene):
    """Moving the object must not touch pixels outside its dirty tiles."""
    cam, w2c, static, dyn = scene
    st = build_static_raster(cam, w2c, static, 0, CFG)
    rgb_a, _, _ = render_incremental([(cam, st, w2c)], dyn, 0, CFG)
    dyn_far = dict(dyn)
    dyn_far["means3D"] = dyn["means3D"] + jnp.asarray([5.0, 5.0, 0.0])
    rgb_b, dep_b, tele = render_incremental([(cam, st, w2c)], dyn_far, 0, CFG)
    # far-moved object leaves the frustum -> zero dirty tiles -> pure cache
    assert (np.asarray(tele[0, :, 0]) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(rgb_b[0, 0]), np.asarray(st.rgb_cache[:, :H, :W]).clip(0, 1))


# ---------------------------------------------------------------------------
# end-to-end: BatchedEvaluator with the incremental path vs the full path
# ---------------------------------------------------------------------------

from pathlib import Path

IK_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")


@pytest.mark.slow
@pytest.mark.skipif(not IK_URDF.exists(), reason="reference assets missing")
def test_batched_incremental_matches_full(tmp_path):
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.testing import (TEST_CAMERAS, full_cfg,
                                           make_rope_points,
                                           make_synthetic_scene,
                                           reference_xarm_urdf,
                                           write_fixture_checkpoint)

    rope = make_rope_points(n=100, length=0.3)
    write_fixture_checkpoint(tmp_path, "rope_inc", rope, spring_Y=2e3)
    gs = make_synthetic_scene(tmp_path / "scans", rope_pts=rope,
                              ik_urdf=str(IK_URDF), n_table=500)
    gs["use_grid_randomization"] = True
    cfg = full_cfg(tmp_path, "rope_inc", gs=gs, cameras=TEST_CAMERAS,
                   urdf=reference_xarm_urdf(),
                   physics_over=dict(dt=2e-4, self_collision=False))

    def build(mode):
        return BatchedEvaluator(
            cfg, episode_ids=[0, 1],
            raster_config=RasterConfig(backend="pallas", interpret=True,
                                       incremental=mode,
                                       pack_payloads=False),
            physics_backend="xla")

    ev_inc = build("on")
    ev_full = build("off")
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    act = jnp.asarray(np.tile(np.concatenate(
        [[0.2568, 0.0, 0.4005], rot, [1.0]]), (2, 1)), jnp.float32)
    for ev in (ev_inc, ev_full):
        ev.step(act, do_velocity_control=False)
    ims_i, deps_i, wims_i, wdeps_i = ev_inc.render()
    ims_f, deps_f, wims_f, wdeps_f = ev_full.render()

    tele, wdrop = ev_inc.render_telemetry
    tele = np.asarray(tele)
    assert tele.shape == (1, 2, 4)
    assert (tele[..., 0] > 0).all()          # robot+object touch tiles
    assert (tele[..., 1:] == 0).all()        # no budget drops
    assert (np.asarray(wdrop) == 0).all()    # wrist binning drops surfaced
    drops = ev_inc.render_drops()
    assert set(drops) == {"fixed_dropped_tiles", "fixed_dropped_pairs",
                          "fixed_binning_dropped", "wrist_binning_dropped"}
    assert all(v == 0 for v in drops.values())

    # the two paths compose the scene in different gaussian order
    # ([dyn; static] vs [obj, meshes, table]), so pixels agree up to
    # equal-depth sort ties — none in this random fixture
    np.testing.assert_allclose(np.asarray(ims_i), np.asarray(ims_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(deps_i), np.asarray(deps_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wims_i), np.asarray(wims_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wdeps_i), np.asarray(wdeps_f),
                               atol=1e-5)


def test_packed_merge_bitwise_vs_packed_full(scene):
    """Production (pack_payloads=True) contract — regression for the
    round-5 on-chip finding (incremental_golden_pixel_check 3.6e-2): the
    merge sort must key on EXACT depths (binning extra_lanes), never the
    f16-quantized depth VALUE lane, or near-coplanar dyn/static pairs
    order differently than the full pipeline (whose rank is computed from
    exact depths BEFORE packing). With exact keys the packed incremental
    path is BITWISE the packed full pipeline on every dirty tile, and
    clean tiles serve the f32 static cache (exact, strictly closer to the
    unpacked truth)."""
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

    st = build_static_raster(cam, w2c, static, 0, cfg_p)
    rgb_i, dep_i, tele = render_incremental(
        [(cam, st, w2c)], dyn, 0, cfg_p, t_budget=96, p_mix=8192)
    assert (np.asarray(tele[0, :, 1:]) == 0).all(), "no drops expected"

    # dirty tiles: bitwise vs the packed full pipeline. Clean tiles come
    # from the unpacked static cache, so compare only where the packed
    # full pipeline agrees with the unpacked one... which is everywhere
    # within one f16 quantum — assert the tight global bound instead.
    rgb_f, dep_f = _full_reference(cam, w2c, static, dyn)  # unpacked truth
    q = float(jnp.abs(rgb_fp[0] - rgb_f[0]).max())         # packing scale
    d = float(jnp.abs(rgb_i[0] - rgb_fp[0]).max())
    assert d <= q + 1e-7, (
        f"packed incremental diverges {d:.2e} from the packed full "
        f"pipeline (packing-inherent scale {q:.2e}) — merge order broke")
    # and vs the unpacked truth it must stay at quantization scale too
    # (the round-5 bug measured 8.1e-3 here at repro scale, 3.56e-2 on
    # chip; pure value quantization is ~1e-3)
    d_u = float(jnp.abs(rgb_i[0] - rgb_f[0]).max())
    assert d_u <= max(2.0 * q, 2e-3), f"{d_u:.2e} vs unpacked truth"
