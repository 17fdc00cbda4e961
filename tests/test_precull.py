"""Block pre-cull (renderer/precull.py): conservative exactness contract.

The contract: compacting the static scene to its camera-visible blocks and
rendering [dyn; culled static] through the full batched pipeline produces
EXACTLY the same pixels as [dyn; full static] — culled blocks emit zero
pairs (their 3-sigma footprints miss the padded image), surviving blocks
keep relative order so the stable pair sort reproduces the same stream.
This mirrors the O(visible) binning property of the CUDA rasterizer
(rasterizer_impl.cu:70-111) without data-dependent shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer import precull
from real2sim_eval_tpu.renderer.camera import setup_camera
from real2sim_eval_tpu.renderer.raster import RasterConfig, rasterize_batch

H, W = 64, 128


def _cam(pos, yaw_deg=0.0):
    k = np.array([[160.0, 0, W / 2], [0, 160.0, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    a = np.deg2rad(yaw_deg)
    c2w[:3, :3] = np.array([[np.cos(a), 0, np.sin(a)],
                            [0, 1, 0],
                            [-np.sin(a), 0, np.cos(a)]], np.float32)
    c2w[:3, 3] = pos
    return setup_camera(W, H, k, np.linalg.inv(c2w))


def _gaussians(rng, n, center, spread, scale=0.02):
    means = (center + rng.normal(scale=spread, size=(n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return {
        "means3D": jnp.asarray(means),
        "scales": jnp.asarray(
            rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32) * scale),
        "rotations": jnp.asarray(quats),
        "opacities": jnp.asarray(
            rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        "shs": jnp.asarray(
            rng.normal(scale=0.3, size=(n, 1, 3)).astype(np.float32)),
    }


@pytest.fixture(scope="module")
def wide_scene():
    """A static scene much wider than one camera's view, in SHUFFLED file
    order (the hard case for contiguous blocks), plus a small dynamic
    set — so the cull must rely on the KD ordering for tight blocks."""
    rng = np.random.default_rng(17)
    # three separated clusters + a sparse sheet: a frustum at any single
    # pose sees a strict subset of blocks
    parts = [
        _gaussians(rng, 800, np.array([0.0, 0.0, 0.4]), 0.25),
        _gaussians(rng, 800, np.array([2.5, 0.0, 0.4]), 0.25),
        _gaussians(rng, 800, np.array([-2.5, 0.3, 0.6]), 0.25),
        _gaussians(rng, 700, np.array([0.0, -1.5, 0.5]), 1.2),
    ]
    static = {k: jnp.concatenate([p[k] for p in parts], 0) for k in parts[0]}
    perm = rng.permutation(static["means3D"].shape[0])
    static = {k: v[perm] for k, v in static.items()}
    dyn1 = _gaussians(rng, 72, np.array([0.1, 0.0, 0.2]), 0.06)
    B = 2
    dyn = {k: jnp.stack([v] * B) for k, v in dyn1.items()}
    dyn["means3D"] = dyn["means3D"] + jnp.asarray(
        [[0.0, 0.0, 0.0], [-0.12, 0.1, 0.02]], jnp.float32)[:, None]
    return static, dyn


def _full_vs_culled(cam, w2c_b, static, dyn, cap=None):
    """Render [dyn; static] dense vs [dyn; culled static]; return both
    frames + overflow."""
    B = dyn["means3D"].shape[0]
    cfg = RasterConfig(backend="pallas", interpret=True, pack_payloads=False,
                       max_pairs_factor=8.0, incremental="off")
    st = precull.spatial_sort_scene(static)
    st = precull.pad_static_scene(st)
    centers, radii = precull.block_bounds(st["means3D"], st["scales"])
    if cap is None:
        # margin=1.0: exactness must hold at EXACT measured demand (the
        # production margin only buys sweep headroom, not correctness)
        cap = precull.plan_static_cull([(cam, w2c_b)], centers, radii,
                                       margin=1.0)
    culled, overflow = jax.jit(
        lambda w: precull.cull_static_blocks(cam, w, st, centers, radii, cap)
    )(w2c_b)
    g = st["means3D"].shape[0] // precull.BLOCK
    assert cap < g or overflow.max() == 0

    full = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(st[k][None], (B,) + st[k].shape)], axis=1)
        for k in st}
    comp = {k: jnp.concatenate([dyn[k], culled[k]], axis=1) for k in st}
    rgb_f, dep_f = rasterize_batch([(cam, w2c_b)], full, 0, config=cfg)
    rgb_c, dep_c = rasterize_batch([(cam, w2c_b)], comp, 0, config=cfg)
    return (rgb_f, dep_f), (rgb_c, dep_c), culled, overflow, cap, g


def test_cull_pixel_exact(wide_scene):
    static, dyn = wide_scene
    cam, w2c = _cam(np.array([0.0, 0.0, -1.3]))
    B = dyn["means3D"].shape[0]
    w2c_b = jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4))
    (rgb_f, dep_f), (rgb_c, dep_c), culled, _, cap, g = _full_vs_culled(
        cam, w2c_b, static, dyn)
    # the cull actually removed work
    assert cap < g, (cap, g)
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


@pytest.mark.parametrize("pose", [
    (np.array([2.5, 0.0, -1.0]), 0.0),
    (np.array([-2.2, 0.3, -0.8]), 15.0),
    (np.array([0.0, -0.5, -2.0]), -25.0),
    (np.array([1.2, 0.2, -0.6]), 40.0),
])
def test_cull_exact_across_poses(wide_scene, pose):
    """Sweeping camera poses (the wrist motion case): every pose renders
    pixel-identically through the cull."""
    static, dyn = wide_scene
    cam, w2c = _cam(pose[0], pose[1])
    B = dyn["means3D"].shape[0]
    w2c_b = jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4))
    (rgb_f, dep_f), (rgb_c, dep_c), *_ = _full_vs_culled(
        cam, w2c_b, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


def test_per_env_poses_differ(wide_scene):
    """Per-env w2c (the real wrist case — each env's eef is elsewhere):
    each env is culled against its own pose."""
    static, dyn = wide_scene
    cam, w2c0 = _cam(np.array([0.0, 0.0, -1.3]))
    _, w2c1 = _cam(np.array([2.5, 0.0, -1.0]), 10.0)
    w2c_b = jnp.stack([jnp.asarray(w2c0), jnp.asarray(w2c1)]).astype(
        jnp.float32)
    (rgb_f, dep_f), (rgb_c, dep_c), *_ = _full_vs_culled(
        cam, w2c_b, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


def test_overflow_is_loud(wide_scene):
    """Capacity below visible demand must report the deficit, not lie."""
    static, dyn = wide_scene
    cam, w2c = _cam(np.array([0.0, 0.0, -1.3]))
    w2c_b = jnp.asarray(w2c, jnp.float32)[None]
    st = precull.spatial_sort_scene(static)
    st = precull.pad_static_scene(st)
    centers, radii = precull.block_bounds(st["means3D"], st["scales"])
    full_cap = precull.plan_static_cull([(cam, w2c_b)], centers, radii)
    n_vis = full_cap  # plan >= measured; measure directly:
    n_vis = int(jnp.sum(precull.visible_mask(cam, w2c, centers, radii)
                        .astype(jnp.int32)))
    assert n_vis > 4
    _, overflow = precull.cull_static_blocks(cam, w2c_b, st, centers, radii,
                                             n_vis - 3)
    assert int(overflow[0]) == 3


def test_block_bounds_contain_members(wide_scene):
    static, _ = wide_scene
    st = precull.pad_static_scene(static)
    centers, radii = precull.block_bounds(st["means3D"], st["scales"])
    m = np.asarray(st["means3D"]).reshape(-1, precull.BLOCK, 3)
    d = np.linalg.norm(m - np.asarray(centers)[:, None, :], axis=-1)
    s3 = 3.0 * np.asarray(st["scales"]).reshape(len(centers), -1).max(1)
    assert (d.max(1) + s3 <= np.asarray(radii) + 1e-5).all()


def test_spatial_sort_tightens_blocks(wide_scene):
    """KD ordering must shrink block spheres vs shuffled file order
    (this is what makes the cull effective on arbitrary scan PLYs)."""
    static, _ = wide_scene
    st_raw = precull.pad_static_scene(static)
    _, r_raw = precull.block_bounds(st_raw["means3D"], st_raw["scales"])
    st_m = precull.pad_static_scene(precull.spatial_sort_scene(static))
    _, r_m = precull.block_bounds(st_m["means3D"], st_m["scales"])
    assert float(jnp.mean(r_m)) < 0.5 * float(jnp.mean(r_raw))


@pytest.mark.slow
def test_evaluator_wrist_precull_pixel_exact(tmp_path):
    """End-to-end: BatchedEvaluator wrist frames with the static pre-cull
    must equal the unculled wrist path bit-for-bit (same pipeline, same
    budgets' coverage, culled blocks emit zero pairs), and the cull must
    actually compact (cap < total blocks)."""
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.testing import (TEST_CAMERAS, full_cfg,
                                           make_rope_points,
                                           make_synthetic_scene,
                                           write_fixture_checkpoint)

    rope = make_rope_points(n=60, length=0.3)
    write_fixture_checkpoint(tmp_path, "rope_test", rope, spring_Y=2e3)
    # a wide floor (3.5 x 4 m) so the wrist camera at ~0.4 m height sees a
    # strict subset of blocks even through the conservative padding
    gs = make_synthetic_scene(tmp_path / "scans", rope_pts=rope,
                              ik_urdf=None, n_table=4000,
                              table_extent=((-1.5, 2.0), (-2.0, 2.0)))
    cfg = full_cfg(tmp_path, "rope_test", gs=gs, cameras=TEST_CAMERAS,
                   physics_over=dict(dt=2e-4, self_collision=False))
    outs = {}
    for mode in ("on", "off"):
        ev = BatchedEvaluator(
            cfg, episode_ids=[0, 1],
            raster_config=RasterConfig(backend="pallas", interpret=True,
                                       incremental="on",
                                       pack_payloads=False,
                                       wrist_precull=mode))
        info = ev.calibrated["wrist_precull"]
        if mode == "on":
            assert info is not None
            assert info["cap_blocks"] < info["total_blocks"], info
        else:
            assert info is None
        _, _, wims, wdeps = ev.render()
        outs[mode] = (np.asarray(wims), np.asarray(wdeps))
        drops = ev.render_drops()
        assert sum(drops.values()) == 0, drops
    np.testing.assert_array_equal(outs["on"][0], outs["off"][0])
    np.testing.assert_array_equal(outs["on"][1], outs["off"][1])


# ---------------------------------------------------------------------------
# dynamic-side cull (posed per-step block bounds, precull.cull_dynamic_blocks)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wide_dyn_scene():
    """A DYNAMIC scene wider than one camera's view (two clusters + an
    off-to-the-side arm-like strand) over a small static backdrop, with
    per-env pose offsets — the wrist case where part of the dynamic set
    (robot links behind the camera, object edges) is off-frustum."""
    rng = np.random.default_rng(23)
    parts = [
        _gaussians(rng, 400, np.array([0.0, 0.0, 0.3]), 0.15),
        _gaussians(rng, 400, np.array([2.8, 0.1, 0.5]), 0.2),
        _gaussians(rng, 300, np.array([-2.6, -0.2, 0.4]), 0.2),
    ]
    dyn1 = {k: jnp.concatenate([p[k] for p in parts], 0) for k in parts[0]}
    B = 2
    dyn = {k: jnp.stack([v] * B) for k, v in dyn1.items()}
    dyn["means3D"] = dyn["means3D"] + jnp.asarray(
        [[0.0, 0.0, 0.0], [0.15, -0.1, 0.05]], jnp.float32)[:, None]
    static = _gaussians(rng, 300, np.array([0.0, 0.4, 0.6]), 0.5)
    return static, dyn


def _full_vs_dyn_culled(cam, w2c_b, static, dyn, cap=None):
    B = dyn["means3D"].shape[0]
    cfg = RasterConfig(backend="pallas", interpret=True, pack_payloads=False,
                       max_pairs_factor=8.0, incremental="off")
    dyn_p = precull.pad_dynamic_scene(dyn)
    if cap is None:
        # margin=1.0: exactness must hold at exact measured demand
        cap = precull.plan_dynamic_cull([(cam, w2c_b)], dyn_p, margin=1.0)
    dyn_c, overflow = jax.jit(
        lambda w, d: precull.cull_dynamic_blocks(cam, w, d, cap))(
        w2c_b, dyn_p)
    g = dyn_p["means3D"].shape[1] // precull.BLOCK
    assert cap < g or overflow.max() == 0

    full = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None], (B,) + static[k].shape)],
        axis=1) for k in static}
    comp = {k: jnp.concatenate(
        [dyn_c[k], jnp.broadcast_to(static[k][None],
                                    (B,) + static[k].shape)], axis=1)
        for k in static}
    rgb_f, dep_f = rasterize_batch([(cam, w2c_b)], full, 0, config=cfg)
    rgb_c, dep_c = rasterize_batch([(cam, w2c_b)], comp, 0, config=cfg)
    return (rgb_f, dep_f), (rgb_c, dep_c), overflow, cap, g


def test_dyn_cull_pixel_exact(wide_dyn_scene):
    """Culled dynamic blocks must render pixel-identically: compaction
    preserves relative order (the [dyn; static] tie rule is an argsort
    over a subsequence) and culled blocks are conservatively
    off-frustum (zero pairs)."""
    static, dyn = wide_dyn_scene
    cam, w2c = _cam(np.array([0.0, 0.0, -1.3]))
    B = dyn["means3D"].shape[0]
    w2c_b = jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4))
    (rgb_f, dep_f), (rgb_c, dep_c), _, cap, g = _full_vs_dyn_culled(
        cam, w2c_b, static, dyn)
    assert cap < g, (cap, g)     # the cull actually removed work
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


def test_dyn_cull_per_env_poses(wide_dyn_scene):
    """Per-env wrist poses AND per-env dynamic positions: each env culls
    against its own posed block bounds."""
    static, dyn = wide_dyn_scene
    cam, w2c0 = _cam(np.array([0.0, 0.0, -1.3]))
    _, w2c1 = _cam(np.array([2.8, 0.0, -1.0]), 12.0)
    w2c_b = jnp.stack([jnp.asarray(w2c0), jnp.asarray(w2c1)]).astype(
        jnp.float32)
    (rgb_f, dep_f), (rgb_c, dep_c), *_ = _full_vs_dyn_culled(
        cam, w2c_b, static, dyn)
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


def test_dyn_cull_moved_object_stays_exact(wide_dyn_scene):
    """The spheres re-derive from POSED means each call: translating the
    dynamic set (LBS motion) must stay exact at the same capacity as long
    as visibility fits it."""
    static, dyn = wide_dyn_scene
    cam, w2c = _cam(np.array([0.0, 0.0, -1.3]))
    B = dyn["means3D"].shape[0]
    w2c_b = jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4))
    dyn_m = dict(dyn)
    dyn_m["means3D"] = dyn["means3D"] + jnp.asarray([0.25, -0.1, 0.08])
    cap = precull.plan_dynamic_cull(
        [(cam, w2c_b)], precull.pad_dynamic_scene(dyn))  # production margin
    (rgb_f, dep_f), (rgb_c, dep_c), overflow, *_ = _full_vs_dyn_culled(
        cam, w2c_b, static, dyn_m, cap=cap)
    assert int(np.asarray(overflow).max()) == 0
    np.testing.assert_array_equal(np.asarray(rgb_c), np.asarray(rgb_f))
    np.testing.assert_array_equal(np.asarray(dep_c), np.asarray(dep_f))


def test_dyn_cull_overflow_is_loud(wide_dyn_scene):
    static, dyn = wide_dyn_scene
    cam, w2c = _cam(np.array([0.0, 0.0, -1.3]))
    w2c_b = jnp.asarray(w2c, jnp.float32)[None]
    dyn1 = {k: v[:1] for k, v in dyn.items()}
    dyn_p = precull.pad_dynamic_scene(dyn1)
    centers, radii = precull.block_bounds(dyn_p["means3D"][0],
                                          dyn_p["scales"][0])
    n_vis = int(jnp.sum(precull.visible_mask(cam, w2c, centers, radii)
                        .astype(jnp.int32)))
    assert n_vis > 4
    _, overflow = precull.cull_dynamic_blocks(cam, w2c_b, dyn_p, n_vis - 3)
    assert int(overflow[0]) == 3


@pytest.mark.slow
def test_evaluator_dyn_cull_pixel_exact(tmp_path):
    """End-to-end: BatchedEvaluator wrist frames with the DYNAMIC cull
    forced on (wrist_precull='on', dense object past the size gate) must
    equal the unculled wrist path bit-for-bit."""
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.testing import (TEST_CAMERAS, full_cfg,
                                           make_rope_points,
                                           make_synthetic_scene,
                                           write_fixture_checkpoint)

    rope = make_rope_points(n=60, length=0.3)
    write_fixture_checkpoint(tmp_path, "rope_dc", rope, spring_Y=2e3)
    gs = make_synthetic_scene(tmp_path / "scans", rope_pts=rope,
                              ik_urdf=None, n_table=4000, n_obj_dense=1200,
                              table_extent=((-1.5, 2.0), (-2.0, 2.0)))
    cfg = full_cfg(tmp_path, "rope_dc", gs=gs, cameras=TEST_CAMERAS,
                   physics_over=dict(dt=2e-4, self_collision=False))
    outs = {}
    for mode in ("on", "off"):
        ev = BatchedEvaluator(
            cfg, episode_ids=[0, 1],
            raster_config=RasterConfig(backend="pallas", interpret=True,
                                       incremental="on",
                                       pack_payloads=False,
                                       wrist_precull=mode))
        info = ev.calibrated["wrist_precull"]
        if mode == "on":
            assert info is not None and info["dyn_cap_blocks"], info
        _, _, wims, wdeps = ev.render()
        outs[mode] = (np.asarray(wims), np.asarray(wdeps))
        drops = ev.render_drops()
        assert sum(drops.values()) == 0, drops
    np.testing.assert_array_equal(outs["on"][0], outs["off"][0])
    np.testing.assert_array_equal(outs["on"][1], outs["off"][1])


def test_spatial_sort_preserves_multiset(wide_scene):
    static, _ = wide_scene
    st = precull.spatial_sort_scene(static)
    a = np.sort(np.asarray(static["means3D"]).round(5).view("S12").ravel())
    b = np.sort(np.asarray(st["means3D"]).round(5).view("S12").ravel())
    assert (a == b).all()
    for k in static:
        assert st[k].shape == static[k].shape
