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

TPU cost note: the duplicate step is a scatter, and TPU scatters serialize
per row (~7 ns each). A single (max_tiles_per_gaussian, N) scatter wastes
~90% of its rows — nearly all Gaussians touch <= ``small_tiles`` tiles of
the wide 8x128 tile grid. The duplicate therefore runs in two levels: a
dense (small_tiles, N) pass plus a (D - small_tiles, max_large) pass over
only the Gaussians with the largest tile rects (measured on v5e at N=31k:
17.6 ms -> ~3 ms per frame). Tile and Gaussian ids are packed into one i32
when they fit so only two value buffers are scattered instead of three.
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
    small_tiles: int = 4,
    max_large: int = 2048,
):
    """Build depth-sorted per-tile gaussian lists.

    Args:
      pre: output of preprocess_gaussians.
      max_pairs: static capacity of the (gaussian, tile) pair buffer.
      small_tiles: rect slots scattered for EVERY gaussian.
      max_large: budget of gaussians whose rect may exceed ``small_tiles``
        (their remaining slots run in a second, narrow scatter; overflow
        beyond the budget is dropped and reported via n_large_dropped).
    Returns dict with:
      order: (max_pairs,) i32 gaussian index per sorted pair (invalid -> N)
      tile_starts / tile_ends: (n_tiles,) i32 pair ranges per tile
      n_pairs: () i32 actual pair count (for overflow diagnostics)
      n_large_dropped: () i32 pairs dropped by the max_large budget
    """
    xy, radius, valid = pre["xy"], pre["radius"], pre["valid"]
    n = xy.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    d_small = min(small_tiles, max_tiles_per_gaussian)
    n_large = min(max_large, n)

    x0, y0, x1, y1 = tile_rect(xy, radius, n_tiles_x, n_tiles_y, tile_w, tile_h)
    rect_w = x1 - x0
    counts = jnp.where(valid, rect_w * (y1 - y0), 0)
    counts = jnp.minimum(counts, max_tiles_per_gaussian)
    offsets = jnp.cumsum(counts) - counts          # exclusive prefix sum
    n_pairs = offsets[-1] + counts[-1] if n > 0 else jnp.asarray(0)

    # pack [tile | gaussian] into one i32 when the bit budget allows, so the
    # duplicate step scatters two buffers instead of three
    gbits = max(int(n).bit_length(), 1)            # gaussian ids in [0, n]
    packable = (n_tiles + 1) << gbits <= 2**31 - 1
    sentinel_pack = jnp.int32((n_tiles << gbits) | n) if packable else None

    depth_g = pre["depth"].astype(jnp.float32)
    gauss_ids = jnp.arange(n, dtype=jnp.int32)

    def dup_rows(d, gsel=None):
        """Tile ids / positions for rect slice d (D', N or D', K)."""
        if gsel is None:
            rw, xx0, yy0, cnt, off = rect_w, x0, y0, counts, offsets
        else:
            rw, xx0, yy0 = rect_w[gsel], x0[gsel], y0[gsel]
            cnt, off = counts[gsel], offsets[gsel]
        tx = xx0[None] + jnp.where(rw[None] > 0, d % jnp.maximum(rw[None], 1), 0)
        ty = yy0[None] + jnp.where(rw[None] > 0, d // jnp.maximum(rw[None], 1), 0)
        tile_id = (ty * n_tiles_x + tx).astype(jnp.int32)
        ok = d < cnt[None]
        pos = off[None] + d
        pos = jnp.where(ok & (pos < max_pairs), pos, max_pairs)
        return tile_id, pos

    d1 = jnp.arange(d_small)[:, None]
    tile1, pos1 = dup_rows(d1)                      # (d_small, N)
    # large pass: gaussians with the biggest rects get their remaining slots
    if max_tiles_per_gaussian > d_small and n_large > 0:
        _, gsel = jax.lax.top_k(counts, n_large)
        gsel = gsel.astype(jnp.int32)
        d2 = jnp.arange(d_small, max_tiles_per_gaussian)[:, None]
        tile2, pos2 = dup_rows(d2, gsel)            # (D - d_small, K)
        extra = jnp.maximum(counts - d_small, 0)
        n_large_dropped = (jnp.sum(extra) - jnp.sum(extra[gsel])).astype(jnp.int32)
    else:
        gsel = tile2 = pos2 = None
        n_large_dropped = jnp.asarray(0, jnp.int32)

    def scatter(buf, val1, val2):
        buf = buf.at[pos1.reshape(-1)].set(val1.reshape(-1), mode="drop")
        if pos2 is not None:
            buf = buf.at[pos2.reshape(-1)].set(val2.reshape(-1), mode="drop")
        return buf[:max_pairs]

    bt1 = jnp.broadcast_to
    if packable:
        pk1 = (tile1 << gbits) | gauss_ids[None]
        pk2 = ((tile2 << gbits) | gsel[None]) if pos2 is not None else None
        packed = scatter(jnp.full((max_pairs + 1,), sentinel_pack, jnp.int32),
                         pk1, pk2)
        depth_buf = scatter(
            jnp.full((max_pairs + 1,), jnp.inf, jnp.float32),
            bt1(depth_g[None], pos1.shape),
            bt1(depth_g[gsel][None], pos2.shape) if pos2 is not None else None)
        _, packed_by_depth = jax.lax.sort((depth_buf, packed), num_keys=1,
                                          is_stable=True)
        tiles_sorted, packed_sorted = jax.lax.sort(
            (packed_by_depth >> gbits, packed_by_depth), num_keys=1,
            is_stable=True)
        order = packed_sorted & ((1 << gbits) - 1)
    else:
        tiles_buf = scatter(jnp.full((max_pairs + 1,), n_tiles, jnp.int32),
                            tile1, tile2)
        gauss_buf = scatter(
            jnp.full((max_pairs + 1,), n, jnp.int32),
            bt1(gauss_ids[None], pos1.shape),
            bt1(gsel[None], pos2.shape) if pos2 is not None else None)
        depth_buf = scatter(
            jnp.full((max_pairs + 1,), jnp.inf, jnp.float32),
            bt1(depth_g[None], pos1.shape),
            bt1(depth_g[gsel][None], pos2.shape) if pos2 is not None else None)
        _, gauss_by_depth, tiles_by_depth = jax.lax.sort(
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
        "n_large_dropped": n_large_dropped,
    }
