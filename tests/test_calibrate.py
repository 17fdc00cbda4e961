"""Three-tier binning emission + init-time budget calibration.

The static-shape discipline (binning.py) means budgets must be fixed at
compile time; renderer/calibrate.py measures per-camera demand on the
initial state and sizes them. These tests pin (a) that the three-tier
emission is a pure re-packing — identical sorted pair streams to the
two-tier form whenever grants cover demand — (b) that insufficient
grants are counted, never silent, and (c) that planned budgets cover
measured demand by construction.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer import calibrate as cal
from real2sim_eval_tpu.renderer.binning import bin_gaussians
from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians, \
    tile_rect
from real2sim_eval_tpu.renderer.raster import Camera, RasterConfig


def scene(seed=0, n=120, big=True):
    rng = np.random.default_rng(seed)
    cam = Camera(width=256, height=64, fx=70.0, fy=70.0, cx=128.0, cy=32.0,
                 z_threshold=0.05)
    means = jnp.asarray(np.stack([
        rng.uniform(-1.2, 1.2, n), rng.uniform(-0.5, 0.5, n),
        rng.uniform(0.3, 3.0, n)], -1), jnp.float32)
    hi = 0.12 if big else 0.05
    scales = jnp.asarray(rng.uniform(0.01, hi, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 1.0, n), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 1, 3)), jnp.float32)
    pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0)
    return cam, pre, n


def _bin(pre, n, **kw):
    kw.setdefault("max_pairs", 8192)
    kw.setdefault("pack_payloads", False)
    return bin_gaussians(pre, 32, 8, 8, 8, **kw)


@pytest.mark.parametrize("seed", [0, 2])
def test_three_tier_matches_two_tier_when_covered(seed):
    cam, pre, n = scene(seed)
    two = _bin(pre, n, max_tiles_per_gaussian=256, small_tiles=4,
               max_large=n)
    three = _bin(pre, n, max_tiles_per_gaussian=256, small_tiles=4,
                 max_large=n, mid_tiles=8, max_mid=n)
    assert int(two["n_large_dropped"]) == 0
    assert int(three["n_large_dropped"]) == 0
    # identical sorted pair streams: same unique [tile|rank] keys
    np.testing.assert_array_equal(np.asarray(two["pair_tile"]),
                                  np.asarray(three["pair_tile"]))
    for a, b in zip(two["pair_lanes"], three["pair_lanes"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_insufficient_grants_counted_not_silent():
    cam, pre, n = scene(1)
    x0, y0, x1, y1 = tile_rect(pre["xy"], pre["radius"], 32, 8, 8, 8)
    counts = np.asarray(jnp.where(pre["valid"],
                                  (x1 - x0) * (y1 - y0), 0))
    counts32 = np.minimum(counts, 32)
    n_gt4 = int((counts32 > 4).sum())
    assert n_gt4 > 6, "fixture must have big rects"
    k_mid = 3
    bins = _bin(pre, n, max_tiles_per_gaussian=32, small_tiles=4,
                max_large=0, mid_tiles=8, max_mid=k_mid)
    # drop accounting: all mid-tier demand except the k_mid biggest,
    # plus ALL top-tier demand (max_large=0)
    extra2 = np.maximum(np.minimum(counts32, 8) - 4, 0)
    extra3 = np.maximum(counts32 - 8, 0)
    # reported n_large_dropped folds in the D-cap rect clamp too
    want = int(extra2.sum() - np.sort(extra2)[::-1][:k_mid].sum()
               + extra3.sum() + (counts - counts32).sum())
    got = int(bins["n_large_dropped"])
    # the granted set is top-k by count (ties broken arbitrarily), so the
    # reported drop can differ only by tie choices of equal extra2
    assert got >= int(extra3.sum())
    assert abs(got - want) <= int(extra2.max())


def test_plan_config_covers_demand():
    cam, pre, n = scene(3)
    scenes = {
        "means3D": jnp.asarray(np.zeros((1, n, 3), np.float32)),
    }
    # use measure_demand on the real scene instead of synthetic zeros
    rng = np.random.default_rng(3)
    means = np.stack([rng.uniform(-1.2, 1.2, n),
                      rng.uniform(-0.5, 0.5, n),
                      rng.uniform(0.3, 3.0, n)], -1)
    scales = rng.uniform(0.01, 0.12, (n, 3))
    q = rng.normal(size=(n, 4))
    quats = q / np.linalg.norm(q, axis=-1, keepdims=True)
    scenes = {
        "means3D": jnp.asarray(means[None], jnp.float32),
        "scales": jnp.asarray(scales[None], jnp.float32),
        "rotations": jnp.asarray(quats[None], jnp.float32),
        "opacities": jnp.asarray(rng.uniform(0.3, 1.0, (1, n)),
                                 jnp.float32),
        "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (1, n, 1, 3)),
                           jnp.float32),
    }
    dem = cal.measure_demand([(cam, jnp.eye(4)[None])], scenes, 0,
                             8, 8, 4, 8, 16)
    assert dem.pairs > 0
    cfg = cal.plan_config(RasterConfig(), dem, n, chunk_align=256,
                         small=4, mid=8, cap=16)
    assert cfg.max_pairs_override >= dem.pairs
    # tiers come from the demand-histogram optimization: whatever split it
    # picked, the grant counts must cover the gaussians beyond each tier
    assert dem.exceed and len(dem.exceed) == len(cal.TIER_CAND)
    s_idx = cal.TIER_CAND.index(cfg.small_tiles)
    if cfg.mid_tiles:
        assert cfg.max_mid >= dem.exceed[s_idx]
        assert cfg.max_large >= dem.exceed[cal.TIER_CAND.index(
            cfg.mid_tiles)]
    else:
        assert cfg.max_large >= dem.exceed[s_idx]
    if dem.max_rect > 16:
        assert cfg.max_tiles_per_gaussian >= dem.max_rect
    # binning under the planned config reports zero drops
    bins = _bin(pre, n, max_pairs=cfg.max_pairs_override,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                small_tiles=cfg.small_tiles, max_large=cfg.max_large,
                mid_tiles=cfg.mid_tiles, max_mid=cfg.max_mid)
    assert int(bins["n_large_dropped"]) == 0
    assert int(bins["n_pairs"]) <= cfg.max_pairs_override


def test_plan_config_fine_covers_demand():
    """Fine-kernel budgets planned from fine-tile demand produce
    zero-drop binning (the honest-A/B prerequisite: the wide kernel is
    calibrated at evaluator build, so the fine kernel must be too)."""
    from real2sim_eval_tpu.renderer.binning_fine import (FINE_H, FINE_W,
                                                         bin_gaussians_fine)

    cam, pre, n = scene(5)
    rng = np.random.default_rng(5)
    means = np.stack([rng.uniform(-1.2, 1.2, n),
                      rng.uniform(-0.5, 0.5, n),
                      rng.uniform(0.3, 3.0, n)], -1)
    scales = rng.uniform(0.01, 0.12, (n, 3))
    q = rng.normal(size=(n, 4))
    quats = q / np.linalg.norm(q, axis=-1, keepdims=True)
    scenes = {
        "means3D": jnp.asarray(means[None], jnp.float32),
        "scales": jnp.asarray(scales[None], jnp.float32),
        "rotations": jnp.asarray(quats[None], jnp.float32),
        "opacities": jnp.asarray(rng.uniform(0.3, 1.0, (1, n)),
                                 jnp.float32),
        "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (1, n, 1, 3)),
                           jnp.float32),
    }
    base = RasterConfig(kernel="fine")
    dem = cal.measure_demand([(cam, jnp.eye(4)[None])], scenes, 0,
                             FINE_W, FINE_H, base.fine_small_tiles,
                             base.fine_small_tiles, base.fine_max_tiles)
    assert dem.pairs > 0
    cfg = cal.plan_config_fine(base, dem, n)
    assert cfg.fine_pairs_override >= dem.pairs
    assert cfg.fine_pairs_override % 8 == 0
    if dem.max_rect > base.fine_max_tiles:
        assert cfg.fine_max_tiles >= min(dem.max_rect, 1024)
    # preprocess at the FINE camera and bin under the planned budgets:
    # drops must be zero and the pair total within the planned buffer
    n_fine_x = -(-cam.width // FINE_W)
    n_sup_y = -(-cam.height // FINE_H)
    assert n_fine_x % 8 == 0
    bins = bin_gaussians_fine(pre, n_fine_x // 8, n_sup_y,
                              cfg.fine_pairs_override,
                              small_tiles=cfg.fine_small_tiles,
                              max_tiles_per_gaussian=cfg.fine_max_tiles,
                              max_large=cfg.max_large,
                              pack_payloads=False)
    assert int(bins["n_large_dropped"]) == 0
    assert int(bins["n_pairs"]) <= cfg.fine_pairs_override


def test_plan_tiers_minimizes_slots_and_covers():
    """The tier optimizer must (a) beat or match the legacy fixed
    (4, 8) split on emitted-slot count for a skewed histogram and
    (b) grant enough rows to cover every threshold it picks."""
    n = 10000
    # skewed demand: almost everything fits 2 tiles, a few are huge
    exceed = tuple(int(n * f) for f in
                   (0.30, 0.04, 0.02, 0.015, 0.01, 0.008, 0.005, 0.003,
                    0.002, 0.001))
    dem = cal.DemandStats(pairs=50000, n_gt_small=150, n_gt_mid=100,
                          n_gt_cap=10, max_rect=40, exceed=exceed)
    s, m, k_m, k_l = cal.plan_tiers(dem, n, cap=52)

    def cost(s, m, k_m, k_l, cap=52):
        g = cal.GRANT_ROW_COST
        if m:
            return n * s + k_m * ((m - s) + g) + k_l * ((cap - m) + g)
        return n * s + k_l * ((cap - s) + g)

    legacy = cost(4, 8,
                  cal._grant_count(exceed[cal.TIER_CAND.index(4)], n, 256),
                  cal._grant_count(exceed[cal.TIER_CAND.index(8)], n, 128))
    assert cost(s, m, k_m, k_l) <= legacy
    assert k_l >= exceed[cal.TIER_CAND.index(m or s)]
    if m:
        assert k_m >= exceed[cal.TIER_CAND.index(s)]
        assert m > s


def test_fine_demand_counts_on_padded_grid():
    """Regression: the fine grid pads x to whole supertiles (8 fine
    columns per 128 px), so rects at the right image edge clamp LATER
    than on the unpadded grid. Demand measured without ntx_round=8
    under-counts there and calibrated budgets drop valid pairs."""
    from real2sim_eval_tpu.renderer.binning_fine import (FINE_H, FINE_W,
                                                         bin_gaussians_fine)

    # W=208: ceil(208/16)=13 fine cols unpadded, padded grid = 16 cols
    cam = Camera(width=208, height=32, fx=60.0, fy=60.0, cx=180.0,
                 cy=16.0, z_threshold=0.05)
    rng = np.random.default_rng(9)
    n = 64
    # cluster at the right edge (cx=180 -> projects near x~180-208+)
    means = np.stack([rng.uniform(-0.1, 0.6, n),
                      rng.uniform(-0.2, 0.2, n),
                      rng.uniform(0.5, 1.5, n)], -1)
    scales = rng.uniform(0.05, 0.15, (n, 3))
    q = rng.normal(size=(n, 4))
    quats = q / np.linalg.norm(q, axis=-1, keepdims=True)
    scenes = {
        "means3D": jnp.asarray(means[None], jnp.float32),
        "scales": jnp.asarray(scales[None], jnp.float32),
        "rotations": jnp.asarray(quats[None], jnp.float32),
        "opacities": jnp.asarray(rng.uniform(0.3, 1.0, (1, n)),
                                 jnp.float32),
        "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (1, n, 1, 3)),
                           jnp.float32),
    }
    base = RasterConfig(kernel="fine")
    dem_pad = cal.measure_demand([(cam, jnp.eye(4)[None])], scenes, 0,
                                 FINE_W, FINE_H, base.fine_small_tiles,
                                 base.fine_small_tiles,
                                 base.fine_max_tiles, ntx_round=8)
    dem_raw = cal.measure_demand([(cam, jnp.eye(4)[None])], scenes, 0,
                                 FINE_W, FINE_H, base.fine_small_tiles,
                                 base.fine_small_tiles,
                                 base.fine_max_tiles)
    assert dem_pad.pairs > dem_raw.pairs, \
        "edge cluster must show the padded-grid demand delta"
    cfg = cal.plan_config_fine(base, dem_pad, n)
    pre = preprocess_gaussians(cam, jnp.eye(4), scenes["means3D"][0],
                               scenes["scales"][0], scenes["rotations"][0],
                               scenes["opacities"][0], scenes["shs"][0], 0)
    bins = bin_gaussians_fine(pre, 2, 4, cfg.fine_pairs_override,
                              small_tiles=cfg.fine_small_tiles,
                              max_tiles_per_gaussian=cfg.fine_max_tiles,
                              max_large=cfg.max_large,
                              pack_payloads=False)
    assert int(bins["n_large_dropped"]) == 0
    assert int(bins["n_pairs"]) <= cfg.fine_pairs_override


def test_plan_mix_budgets_cover():
    t, p = cal.plan_mix_budgets(None, dyn_demand_pairs=3000, n_dirty=20,
                                mix_demand=26447)
    assert t >= 20 and t % 8 == 0
    assert p >= 26447 and p % 512 == 0
