"""Tile binning: duplicate-by-tile + depth sort + range extraction.

The jnp/XLA counterpart of the CUDA rasterizer's binning stage
(reference: rasterizer_impl.cu:70-138,166-193,279-311): per-Gaussian tile
counts -> prefix sum (cub InclusiveSum -> jnp.cumsum) -> duplicated
[tile|depth] keys (duplicateWithKeys) -> radix sort (cub -> two stable
lax.sort_key_val passes) -> per-tile ranges (identifyTileRanges ->
searchsorted).

Static-shape discipline: the pair buffer has fixed capacity ``max_pairs``;
each Gaussian contributes at most ``max_tiles_per_gaussian`` pairs. Overflow
is dropped deterministically (and reported via ``n_pairs`` so callers can
log it, never silently under-render a benchmark scene).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .preprocess import tile_rect


def bin_gaussians(
    pre: dict,
    n_tiles_x: int,
    n_tiles_y: int,
    tile_w: int,
    tile_h: int,
    max_pairs: int,
    max_tiles_per_gaussian: int = 32,
):
    """Build depth-sorted per-tile gaussian lists.

    Args:
      pre: output of preprocess_gaussians.
      max_pairs: static capacity of the (gaussian, tile) pair buffer.
    Returns dict with:
      order: (max_pairs,) i32 gaussian index per sorted pair (invalid -> N)
      tile_starts / tile_ends: (n_tiles,) i32 pair ranges per tile
      n_pairs: () i32 actual pair count (for overflow diagnostics)
    """
    xy, radius, valid = pre["xy"], pre["radius"], pre["valid"]
    n = xy.shape[0]
    n_tiles = n_tiles_x * n_tiles_y

    x0, y0, x1, y1 = tile_rect(xy, radius, n_tiles_x, n_tiles_y, tile_w, tile_h)
    rect_w = x1 - x0
    counts = jnp.where(valid, rect_w * (y1 - y0), 0)
    counts = jnp.minimum(counts, max_tiles_per_gaussian)
    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    n_pairs = offsets[-1] + counts[-1] if n > 0 else jnp.asarray(0)

    # duplicate with keys: slice d of every gaussian's rect
    d = jnp.arange(max_tiles_per_gaussian)[:, None]           # (D, 1)
    tx = x0[None] + jnp.where(rect_w[None] > 0, d % jnp.maximum(rect_w[None], 1), 0)
    ty = y0[None] + jnp.where(rect_w[None] > 0, d // jnp.maximum(rect_w[None], 1), 0)
    tile_id = ty * n_tiles_x + tx                              # (D, N)
    pair_ok = d < counts[None]
    pair_pos = offsets[None] + d                               # (D, N)
    pair_pos = jnp.where(pair_ok & (pair_pos < max_pairs), pair_pos, max_pairs)

    # scatter into the fixed pair buffer (drop OOB via clamp-to-sentinel row)
    tiles_buf = jnp.full((max_pairs + 1,), n_tiles, jnp.int32)
    gauss_buf = jnp.full((max_pairs + 1,), n, jnp.int32)
    depth_buf = jnp.full((max_pairs + 1,), jnp.inf, jnp.float32)
    tiles_buf = tiles_buf.at[pair_pos.reshape(-1)].set(
        tile_id.astype(jnp.int32).reshape(-1), mode="drop")
    gauss_buf = gauss_buf.at[pair_pos.reshape(-1)].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                         pair_pos.shape).reshape(-1), mode="drop")
    depth_buf = depth_buf.at[pair_pos.reshape(-1)].set(
        jnp.broadcast_to(pre["depth"][None].astype(jnp.float32),
                         pair_pos.shape).reshape(-1), mode="drop")
    tiles_buf, gauss_buf, depth_buf = (
        tiles_buf[:max_pairs], gauss_buf[:max_pairs], depth_buf[:max_pairs])

    # two-pass stable sort == radix sort on [tile | depth] keys
    depth_sorted, gauss_by_depth, tiles_by_depth = jax.lax.sort(
        (depth_buf, gauss_buf, tiles_buf), num_keys=1, is_stable=True)
    tiles_sorted, order = jax.lax.sort(
        (tiles_by_depth, gauss_by_depth), num_keys=1, is_stable=True)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tiles_sorted, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tiles_sorted, tile_ids, side="right").astype(jnp.int32)

    return {
        "order": order,
        "tile_starts": starts,
        "tile_ends": ends,
        "n_pairs": jnp.minimum(n_pairs, max_pairs).astype(jnp.int32),
        "n_pairs_unclamped": n_pairs.astype(jnp.int32),
    }
