"""Fine-tile binning: clamped-rect slot emission + analytic stream bounds.

The fine compositor (fine_kernel.py) walks 8 depth-sorted pair streams per
(8,128) supertile, one per (8,16)-pixel fine tile. This builder produces
its inputs from the preprocess output, reusing binning.py's design (slot
emission in original gaussian order, ONE [tile|depth-rank] u32 sort
carrying the 10 compositor attr lanes as payloads) with two fine-specific
changes:

1. **Rects are budget-clamped as rects** (centered on the projected mean),
   not row-major-truncated: a gaussian granted A slots keeps a
   w1 x h1 <= A sub-rect of its tile rect. Every emitted slot is then a
   cell of that sub-rect, which makes per-tile stream lengths EXACTLY
   countable without touching the sorted array:

2. **Stream bounds come from one 0/1-indicator matmul** instead of a
   searchsorted over the sorted stream: counts[ty, tx] = sum_g
   Ay[g, ty] * Bx[g, tx] with Ay/Bx the clamped-rect interval indicators —
   an MXU contraction, exact in f32 (0/1 products, integer sums < 2^24).
   Exclusive-cumsum of the row-major counts IS the per-fine-tile start
   table (the sort is keyed by the same row-major fine-tile id).
   binning.py's searchsorted cost 21 ms/step at 64 wrist instances for 332
   queries and scales with tile count — 3k+ fine tiles would make it the
   biggest stage in the frame.

Unlike binning.py there is NO per-slot conic cull: 16-px fine rects are
already tight around the ~10-px splat footprint, and a culled slot would
still have to occupy its stream position for the analytic counts to stay
exact. Pairs that contribute nothing are rejected per pixel in the kernel
(alpha < 1/255), so dropping the cull is pixel-exact by the same argument
(reference: forward.cu:262-394's per-pixel alpha floor).

Budgets report their drops (``n_large_dropped``) — binning.py's
no-silent-under-render rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import pack_attr_lanes, unpack_attr_lanes
from .fine_kernel import GROUPS
from .preprocess import tile_rect

N_PAY = 10       # attr lanes: x, y, conic(3), opacity, rgb, depth
FINE_W = 16
FINE_H = 8


def bin_gaussians_fine(
    pre: dict,
    n_super_x: int,
    n_super_y: int,
    max_pairs: int,
    small_tiles: int = 8,      # dense slot budget per gaussian
    max_tiles_per_gaussian: int = 32,   # budget for the k_large biggest
    max_large: int = 4096,
    pack_payloads: bool = True,  # f16-pack 8 of the 10 sort payload lanes
    extra_lanes: list | None = None,  # extra (N,) per-gaussian sort payloads
):
    """Build fine-tile sorted pair streams with analytic bounds.

    Returns dict with:
      pair_lanes: list of 10 (max_pairs,) f32 sorted payload lanes
      pair_tile: (max_pairs,) i32 fine-tile id per sorted pair
      fine_starts / fine_ends: (n_fine,) i32 pair ranges per fine tile
        (supertile-major == row-major fine ids), already cropped to
        max_pairs
      n_pairs / n_pairs_unclamped / n_large_dropped: () i32 telemetry
      extra_sorted: (only when ``extra_lanes``) the extra per-gaussian
        lanes duplicated per slot and sorted with the pairs (the packed
        merge path rides the EXACT depth through here — binning.py's
        contract)
    """
    xy, radius, valid = pre["xy"], pre["radius"], pre["valid"]
    n = xy.shape[0]
    n_fine_x = n_super_x * GROUPS
    n_fine = n_fine_x * n_super_y
    d_small = max(small_tiles, 1)
    D = max(max_tiles_per_gaussian, d_small)
    k_large = min(max_large, n)

    # depth rank (stable argsort: equal depths tie-break by gaussian id,
    # the CUDA radix order of [tile|depth] keys)
    depth_key = jnp.where(valid, pre["depth"].astype(jnp.float32), jnp.inf)
    order_g = jnp.argsort(depth_key).astype(jnp.int32)
    inv_rank = jnp.argsort(order_g).astype(jnp.int32)

    x0, y0, x1, y1 = tile_rect(xy, radius, n_fine_x, n_super_y,
                               FINE_W, FINE_H)
    w = x1 - x0
    h = y1 - y0
    area = jnp.where(valid, w * h, 0)
    n_pairs_unclamped = jnp.sum(area).astype(jnp.int32)

    # slot grant: the k_large biggest rects get D slots, the rest d_small
    if D > d_small and k_large > 0:
        _, sel = jax.lax.top_k(jnp.minimum(area, D), k_large)
        sel = sel.astype(jnp.int32)
        member = jnp.zeros((n,), bool).at[sel].set(True)
    else:
        sel = jnp.zeros((0,), jnp.int32)
        member = jnp.zeros((n,), bool)
    grant = jnp.where(member, D, d_small)

    # centered rect clamp: keep a w1 x h1 <= grant sub-rect around the
    # projected mean (the budget drop is the strips outside it, counted)
    w1 = jnp.clip(jnp.minimum(w, grant), 0, None)
    w1s = jnp.maximum(w1, 1)
    h1 = jnp.clip(jnp.minimum(h, grant // w1s), 0, None)
    area1 = w1 * h1
    cxt = jnp.clip((xy[:, 0] / FINE_W).astype(jnp.int32), x0,
                   jnp.maximum(x1 - 1, x0))
    cyt = jnp.clip((xy[:, 1] / FINE_H).astype(jnp.int32), y0,
                   jnp.maximum(y1 - 1, y0))
    x0c = jnp.clip(cxt - (w1 - 1) // 2, x0, x1 - w1)
    y0c = jnp.clip(cyt - (h1 - 1) // 2, y0, y1 - h1)
    # emission gates on area1 ONLY, so it must carry the valid mask itself:
    # an invalid gaussian (near-culled but projecting in-image, or det<=0)
    # has a 1x1 tile rect, and an unmasked slot would enter the sorted
    # stream while the analytic counts (Ay carries okf) exclude it —
    # shifting every later tile's stream bounds off by one
    area1 = jnp.where(valid, area1, 0)
    n_rect_dropped = jnp.sum(jnp.where(valid, area - area1, 0))

    # analytic per-tile counts: one 0/1 indicator contraction on the MXU
    ty_iota = jnp.arange(n_super_y, dtype=jnp.int32)
    tx_iota = jnp.arange(n_fine_x, dtype=jnp.int32)
    okf = valid.astype(jnp.float32)
    Ay = (((ty_iota[None, :] >= y0c[:, None])
           & (ty_iota[None, :] < (y0c + h1)[:, None])).astype(jnp.float32)
          * okf[:, None])                                    # (N, nty)
    Bx = ((tx_iota[None, :] >= x0c[:, None])
          & (tx_iota[None, :] < (x0c + w1)[:, None])).astype(jnp.float32)
    counts = jax.lax.dot_general(Ay, Bx, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    counts = counts.reshape(-1).astype(jnp.int32)            # (n_fine,)
    csum = jnp.cumsum(counts)
    starts_all = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), csum[:-1]])
    total = csum[-1]
    fine_starts = jnp.minimum(starts_all, max_pairs)
    fine_ends = jnp.minimum(starts_all + counts, max_pairs)
    n_crop_dropped = jnp.maximum(total - max_pairs, 0)

    # the 10 kernel attr lanes, original gaussian order
    attrs = jnp.concatenate([
        xy, pre["conic"], pre["opacity"].reshape(-1, 1), pre["rgb"],
        pre["depth"].reshape(-1, 1),
    ], axis=-1).astype(jnp.float32)                          # (N, 10)
    pay_src = (pack_attr_lanes(attrs) if pack_payloads
               else [attrs[:, L] for L in range(N_PAY)])
    n_attr_lanes = len(pay_src)
    if extra_lanes:
        pay_src = pay_src + [jnp.asarray(v) for v in extra_lanes]
    aux = jnp.stack([
        x0c.astype(jnp.float32), y0c.astype(jnp.float32),
        w1s.astype(jnp.float32), area1.astype(jnp.float32),
        inv_rank.astype(jnp.float32),
    ], axis=-1)                                              # (N, 5)

    def emit(d_lo, d_hi, take=None):
        # slot-major (d, N): N in the lane dimension (see binning.py emit —
        # the (N, d) form runs at <=16/128 lane utilization). Sorted
        # output is bitwise invariant (unique [tile|rank] keys).
        d = jnp.arange(d_lo, d_hi, dtype=jnp.int32)[:, None]
        if take is None:
            au, ps = aux, pay_src
        else:
            au = aux[take]
            ps = [v[take] for v in pay_src]
        xx0 = au[:, 0].astype(jnp.int32)[None, :]
        yy0 = au[:, 1].astype(jnp.int32)[None, :]
        ww = jnp.maximum(au[:, 2].astype(jnp.int32), 1)[None, :]
        cnt = au[:, 3].astype(jnp.int32)[None, :]
        rank = au[:, 4].astype(jnp.int32)[None, :]
        tx = xx0 + d % ww
        ty = yy0 + d // ww
        ok = d < cnt
        tile = jnp.where(ok, ty * n_fine_x + tx, n_fine)
        shape = tile.shape
        rank_b = jnp.broadcast_to(rank, shape)
        pay = [jnp.broadcast_to(v[None, :], shape).reshape(-1) for v in ps]
        return tile.reshape(-1), rank_b.reshape(-1), pay

    tiles1, rank1, pay1 = emit(0, d_small)
    if D > d_small and k_large > 0:
        tiles2, rank2, pay2 = emit(d_small, D, sel)
        tile_f = jnp.concatenate([tiles1, tiles2])
        rank_f = jnp.concatenate([rank1, rank2])
        pay_f = [jnp.concatenate([a, b]) for a, b in zip(pay1, pay2)]
    else:
        tile_f, rank_f, pay_f = tiles1, rank1, pay1

    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = max(n_fine.bit_length(), 1)
    assert rank_bits + tile_bits <= 32, \
        f"fine tile/rank key overflow: {n} gaussians x {n_fine} tiles"
    key = (tile_f.astype(jnp.uint32) << rank_bits) | rank_f.astype(jnp.uint32)
    if pack_payloads:
        out = jax.lax.sort((key,) + tuple(pay_f), num_keys=1,
                           is_stable=False)
        key_s = out[0]
        lanes = list(out[1:])
    else:
        out_a = jax.lax.sort((key,) + tuple(pay_f[:5]), num_keys=1,
                             is_stable=False)
        out_b = jax.lax.sort((key,) + tuple(pay_f[5:]), num_keys=1,
                             is_stable=False)
        key_s = out_a[0]
        lanes = list(out_a[1:]) + list(out_b[1:])

    extra_s = lanes[n_attr_lanes:]
    lanes = lanes[:n_attr_lanes]
    slot_total = tile_f.shape[0]
    if slot_total >= max_pairs:
        key_s = key_s[:max_pairs]
        lanes = [v[:max_pairs] for v in lanes]
        extra_s = [v[:max_pairs] for v in extra_s]
    else:
        pad = max_pairs - slot_total
        key_s = jnp.pad(key_s, (0, pad),
                        constant_values=jnp.uint32(n_fine << rank_bits))
        lanes = [jnp.pad(v, (0, pad)) for v in lanes]
        extra_s = [jnp.pad(v, (0, pad)) for v in extra_s]
    tiles_sorted = (key_s >> rank_bits).astype(jnp.int32)
    if pack_payloads:
        lanes = unpack_attr_lanes(lanes)   # post-sort: back to 10 f32 lanes

    out = {
        "pair_lanes": lanes,
        "pair_tile": tiles_sorted,
        "fine_starts": fine_starts,
        "fine_ends": fine_ends,
        "n_pairs": jnp.minimum(total, max_pairs).astype(jnp.int32),
        "n_pairs_unclamped": n_pairs_unclamped,
        "n_large_dropped": (n_rect_dropped + n_crop_dropped
                            ).astype(jnp.int32),
    }
    if extra_lanes:
        out["extra_sorted"] = extra_s
    return out
