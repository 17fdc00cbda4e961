"""Tile binning: depth-sort + dense slot emission + one stable tile sort.

The jnp/XLA counterpart of the CUDA rasterizer's binning stage
(reference: rasterizer_impl.cu:70-138,166-193,279-311): per-Gaussian tile
counts -> duplicated [tile|depth] keys (duplicateWithKeys) -> radix sort
(cub) -> per-tile ranges (identifyTileRanges -> searchsorted).

TPU redesign (v2): the CUDA duplicate step is a scatter, and TPU scatters
serialize per row (~7 ns each) — at batch x camera instance counts the
round-1 two-level scatter became the frame bottleneck AND silently starved
large-rect gaussians through its `max_large` budget (the round-2 golden
pixel check caught exactly that). Sorts, in contrast, vectorize. So:

  1. sort gaussians by view depth once (argsort, N keys);
  2. emit each gaussian's tile ids DENSELY into a (N, D) slot block in
     depth order (pure elementwise math, no scatter);
  3. ONE stable sort of the N*D flattened tile ids, carrying gaussian ids:
     stability preserves depth order within each tile — exactly the CUDA
     [tile|depth] radix order (forward.cu front-to-back contract);
  4. per-tile ranges via searchsorted.

Static-shape discipline: the result is cropped to ``max_pairs``; a gaussian
rect is clamped to D = ``max_tiles_per_gaussian`` tiles. BOTH budgets report
their drops (``n_rect_dropped``, ``n_pairs_unclamped`` vs ``n_pairs``) —
never silently under-render a benchmark scene.
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
    max_tiles_per_gaussian: int = 16,
    small_tiles: int = 4,      # kept for config compatibility (unused in v2)
    max_large: int = 2048,     # kept for config compatibility (unused in v2)
):
    """Build depth-sorted per-tile gaussian lists.

    Args:
      pre: output of preprocess_gaussians.
      max_pairs: static capacity of the (gaussian, tile) pair buffer.
      max_tiles_per_gaussian: per-gaussian tile-rect clamp (D).
    Returns dict with:
      order: (max_pairs,) i32 gaussian index per sorted pair (invalid -> N)
      tile_starts / tile_ends: (n_tiles,) i32 pair ranges per tile
      n_pairs: () i32 pairs that made it into the buffer
      n_pairs_unclamped: () i32 pairs before the capacity crop
      n_large_dropped: () i32 pairs dropped by the per-gaussian rect clamp
    """
    xy, radius, valid = pre["xy"], pre["radius"], pre["valid"]
    n = xy.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    D = max_tiles_per_gaussian

    # 1. depth order (invalid sink to the end)
    depth_key = jnp.where(valid, pre["depth"].astype(jnp.float32), jnp.inf)
    order_g = jnp.argsort(depth_key).astype(jnp.int32)          # (N,)

    x0, y0, x1, y1 = tile_rect(xy, radius, n_tiles_x, n_tiles_y,
                               tile_w, tile_h)
    rect_w = (x1 - x0)[order_g]
    x0o = x0[order_g]
    y0o = y0[order_g]
    counts = jnp.where(valid[order_g], rect_w * (y1 - y0)[order_g], 0)
    counts_c = jnp.minimum(counts, D)
    n_rect_dropped = jnp.sum(counts - counts_c).astype(jnp.int32)
    n_pairs_unclamped = jnp.sum(counts).astype(jnp.int32)
    n_emitted = jnp.sum(counts_c).astype(jnp.int32)

    # 2. dense slot emission in depth order (no scatter)
    d = jnp.arange(D, dtype=jnp.int32)[None, :]                 # (1, D)
    rw = jnp.maximum(rect_w, 1)[:, None]
    tx = x0o[:, None] + d % rw
    ty = y0o[:, None] + d // rw
    tile = jnp.where(d < counts_c[:, None],
                     (ty * n_tiles_x + tx).astype(jnp.int32), n_tiles)
    gid = jnp.where(d < counts_c[:, None], order_g[:, None], n)

    # 3. one sort by tile; equal tiles keep depth order. The slot flat
    # index IS the depth rank, so packing [tile | rank] into one i32 makes
    # every key unique and the cheaper UNSTABLE sort exact (measured ~12%
    # faster than the stable two-operand sort on v5e).
    total = n * D
    rank_bits = max((total - 1).bit_length(), 1)
    tile_bits = max(n_tiles.bit_length(), 1)
    if rank_bits + tile_bits <= 31:
        rank = jnp.arange(total, dtype=jnp.int32)
        key = tile.reshape(-1) * jnp.int32(1 << rank_bits) + rank
        key_s, gid_sorted = jax.lax.sort((key, gid.reshape(-1)), num_keys=1,
                                         is_stable=False)
        tiles_sorted = key_s >> rank_bits
    else:
        tiles_sorted, gid_sorted = jax.lax.sort(
            (tile.reshape(-1), gid.reshape(-1)), num_keys=1, is_stable=True)

    # 4. crop/pad to the static pair budget + tile ranges
    total = n * D
    if total >= max_pairs:
        tiles_sorted = tiles_sorted[:max_pairs]
        order = gid_sorted[:max_pairs]
    else:
        pad = max_pairs - total
        tiles_sorted = jnp.pad(tiles_sorted, (0, pad),
                               constant_values=n_tiles)
        order = jnp.pad(gid_sorted, (0, pad), constant_values=n)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tiles_sorted, tile_ids,
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tiles_sorted, tile_ids,
                            side="right").astype(jnp.int32)

    return {
        "order": order,
        "tile_starts": starts,
        "tile_ends": ends,
        "n_pairs": jnp.minimum(n_emitted, max_pairs).astype(jnp.int32),
        "n_pairs_unclamped": n_pairs_unclamped,
        "n_large_dropped": (n_rect_dropped
                            + jnp.maximum(n_emitted - max_pairs, 0)
                            ).astype(jnp.int32),
    }
