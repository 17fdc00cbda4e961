"""Fine-tile binning: the analytic (matmul+cumsum) stream bounds must be
exactly the sorted-stream boundaries, and budget drops must be loud."""

import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer.binning_fine import bin_gaussians_fine
from real2sim_eval_tpu.renderer.fine_kernel import GROUPS
from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians
from real2sim_eval_tpu.renderer.raster import Camera


def scene(seed=0, n=80):
    rng = np.random.default_rng(seed)
    cam = Camera(width=256, height=64, fx=80.0, fy=80.0, cx=128.0, cy=32.0,
                 z_threshold=0.05)
    means = jnp.asarray(np.stack([
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.4, 0.4, n),
        rng.uniform(0.4, 3.0, n)], -1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4))
    quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True),
                        jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    shs = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 1, 3)), jnp.float32)
    pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0)
    return cam, pre, n


@pytest.mark.parametrize("seed", [0, 3])
def test_analytic_bounds_equal_sorted_boundaries(seed):
    cam, pre, n = scene(seed)
    nsx, nsy = 2, 8            # 256/128, 64/8
    n_fine = nsx * GROUPS * nsy
    bins = bin_gaussians_fine(pre, nsx, nsy, max_pairs=16384,
                              small_tiles=6, max_tiles_per_gaussian=128,
                              max_large=n, pack_payloads=False)
    tiles = np.asarray(bins["pair_tile"])
    starts_ref = np.searchsorted(tiles, np.arange(n_fine), side="left")
    ends_ref = np.searchsorted(tiles, np.arange(n_fine), side="right")
    np.testing.assert_array_equal(np.asarray(bins["fine_starts"]),
                                  starts_ref)
    np.testing.assert_array_equal(np.asarray(bins["fine_ends"]), ends_ref)
    assert int(bins["n_large_dropped"]) == 0
    # streams are depth-rank ordered within each tile
    lanes = [np.asarray(v) for v in bins["pair_lanes"]]
    depth = lanes[9]
    s, e = np.asarray(bins["fine_starts"]), np.asarray(bins["fine_ends"])
    for t in range(n_fine):
        d = depth[s[t]:e[t]]
        assert (np.diff(d) >= -1e-6).all(), f"tile {t} not front-to-back"


def test_rect_clamp_drops_counted():
    cam, pre, n = scene(1)
    bins_full = bin_gaussians_fine(pre, 2, 8, max_pairs=16384,
                                   small_tiles=6,
                                   max_tiles_per_gaussian=128, max_large=n)
    bins_tight = bin_gaussians_fine(pre, 2, 8, max_pairs=16384,
                                    small_tiles=2,
                                    max_tiles_per_gaussian=4, max_large=4)
    assert int(bins_tight["n_large_dropped"]) > 0
    assert int(bins_tight["n_pairs"]) < int(bins_full["n_pairs"])
    assert (int(bins_tight["n_pairs"]) + int(bins_tight["n_large_dropped"])
            == int(bins_tight["n_pairs_unclamped"]))
    # bounds stay consistent with the (clamped) sorted stream
    tiles = np.asarray(bins_tight["pair_tile"])
    n_fine = 2 * GROUPS * 8
    np.testing.assert_array_equal(
        np.asarray(bins_tight["fine_starts"]),
        np.searchsorted(tiles, np.arange(n_fine), side="left"))


def test_pair_budget_crop_counted():
    cam, pre, n = scene(2)
    bins = bin_gaussians_fine(pre, 2, 8, max_pairs=64, small_tiles=6,
                              max_tiles_per_gaussian=128, max_large=n)
    assert int(bins["n_large_dropped"]) > 0
    assert (np.asarray(bins["fine_ends"]) <= 64).all()
    assert (np.asarray(bins["fine_starts"])
            <= np.asarray(bins["fine_ends"])).all()


def test_invalid_gaussians_do_not_shift_streams():
    """Regression: a near-culled gaussian (z < z_threshold) whose 1x1 tile
    rect projects in-image must NOT enter the sorted stream — the analytic
    counts exclude invalid gaussians, so an unmasked emission would shift
    every later tile's bounds off by one."""
    cam, pre, n = scene(7)
    import jax.numpy as jnp
    # forge a handful of invalid-but-in-image gaussians: valid=False with a
    # finite xy and a nonzero 1x1 rect footprint (radius floor 1 px)
    pre = dict(pre)
    bad = jnp.zeros((n,), bool).at[jnp.arange(5)].set(True)
    pre["valid"] = pre["valid"] & ~bad
    pre["xy"] = jnp.where(bad[:, None],
                          jnp.asarray([[40.0, 20.0]]), pre["xy"])
    pre["radius"] = jnp.where(bad, 1.0, pre["radius"])
    pre["depth"] = jnp.where(bad, 0.01, pre["depth"])
    nsx, nsy = 2, 8
    n_fine = nsx * GROUPS * nsy
    bins = bin_gaussians_fine(pre, nsx, nsy, max_pairs=16384,
                              small_tiles=6, max_tiles_per_gaussian=128,
                              max_large=n, pack_payloads=False)
    tiles = np.asarray(bins["pair_tile"])
    starts_ref = np.searchsorted(tiles, np.arange(n_fine), side="left")
    ends_ref = np.searchsorted(tiles, np.arange(n_fine), side="right")
    np.testing.assert_array_equal(np.asarray(bins["fine_starts"]),
                                  starts_ref)
    np.testing.assert_array_equal(np.asarray(bins["fine_ends"]), ends_ref)
