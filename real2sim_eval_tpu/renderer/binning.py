"""Tile binning: slot emission + payload-carrying tile sort.

The jnp/XLA counterpart of the CUDA rasterizer's binning stage
(reference: rasterizer_impl.cu:70-138,166-193,279-311): per-Gaussian tile
counts -> duplicated [tile|depth] keys (duplicateWithKeys) -> radix sort
(cub) -> per-tile ranges (identifyTileRanges -> searchsorted).

TPU redesign (v3): scatters serialize per row, and batched row GATHERS
measure ~35 ns/row — at pair-buffer sizes either one dominates the frame
(the v2 rank-gather was 190 ms/step at 64 wrist instances). Sorts, in
contrast, vectorize (~2 ns/key + ~2 ns per payload lane), so everything
rides one mechanism:

  1. argsort gaussians by view depth; a second argsort inverts the
     permutation into each gaussian's depth RANK (the in-tile ordering
     key). All other per-gaussian quantities stay in ORIGINAL order — no
     permutation gathers at all;
  2. emit each gaussian's tile ids DENSELY into (N, d_small) slot blocks
     (pure elementwise math, no scatter), with per-slot pixel-exact conic
     culling (below); the k_large biggest rects get a continuation block;
  3. ONE sort of the flattened [tile | depth-rank] u32 keys CARRYING the
     10 compositor attr lanes as payloads — as TWO 5-payload sorts
     (payload cost grows superlinearly with count; the keys are unique,
     so both unstable sorts produce the identical permutation). The
     sorted payloads ARE the kernel pair table: no post-sort gather
     exists anywhere;
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

ATTR = 16        # lanes per pair row (matches tile_kernel.ATTR)
N_PAY = 10       # meaningful attr lanes: x, y, conic(3), opacity, rgb, depth


def pack_f16_lane(a: jax.Array, b: jax.Array) -> jax.Array:
    """Two f32 lanes -> one u32 lane of packed f16 halves (a hi, b lo)."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
    return (ah << 16) | bh


def unpack_f16_lane(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    a = jax.lax.bitcast_convert_type(
        (p >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (p & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    return a, b


def pack_attr_lanes(attrs: jax.Array) -> list[jax.Array]:
    """(N, 10) f32 attr table -> 6 sort-payload lanes: x, y kept f32
    (sub-pixel position accuracy drives the conic quadratic), the rest as
    f16 pairs (VERDICT round-2 item 2: payload lanes are the dominant sort
    cost — ~2 ns/lane/key — and f16 keeps conic/color/depth errors ~5e-4
    relative, far inside the 1/255 rgb / 1e-2 depth golden tolerance)."""
    return [attrs[:, 0], attrs[:, 1],
            pack_f16_lane(attrs[:, 2], attrs[:, 3]),
            pack_f16_lane(attrs[:, 4], attrs[:, 5]),
            pack_f16_lane(attrs[:, 6], attrs[:, 7]),
            pack_f16_lane(attrs[:, 8], attrs[:, 9])]


def unpack_attr_lanes(lanes: list[jax.Array]) -> list[jax.Array]:
    out = [lanes[0], lanes[1]]
    for p in lanes[2:]:
        a, b = unpack_f16_lane(p)
        out += [a, b]
    return out


def bin_gaussians(
    pre: dict,
    n_tiles_x: int,
    n_tiles_y: int,
    tile_w: int,
    tile_h: int,
    max_pairs: int,
    max_tiles_per_gaussian: int = 16,
    small_tiles: int = 8,      # dense tile slots per gaussian
    max_large: int = 4096,     # gaussians granted slots beyond small_tiles
    pack_payloads: bool = True,  # f16-pack 8 of the 10 sort payload lanes
    mid_tiles: int = 0,        # optional middle tier cap (0 = two-tier)
    max_mid: int = 0,          # gaussians granted slots [small, mid_tiles)
    extra_lanes: list | None = None,  # extra (N,) per-gaussian sort payloads
):
    """Build depth-sorted per-tile gaussian pair tables.

    Args:
      pre: output of preprocess_gaussians.
      max_pairs: static capacity of the (gaussian, tile) pair buffer.
      max_tiles_per_gaussian: per-gaussian tile-rect clamp (D).
    Returns dict with:
      pair_lanes: 10 (max_pairs,) f32 sorted attr lanes (x, y, conic
        a/b/c, opacity, r, g, b, depth); rows outside every tile range
        are dead. Unstacked on purpose — see the layout note at the end
        of this function
      pair_tile: (max_pairs,) i32 tile id per sorted pair (invalid:
        n_tiles)
      tile_starts / tile_ends: (n_tiles,) i32 pair ranges per tile
      n_pairs: () i32 pairs that made it into the buffer
      n_pairs_unclamped: () i32 pairs before the capacity crop
      n_large_dropped: () i32 pairs dropped by the per-gaussian rect clamp
      extra_sorted: (only when ``extra_lanes``) the extra per-gaussian
        lanes duplicated per slot and sorted with the pairs — the diff
        path rides the gaussian ID through here so backward can
        segment-sum pair grads to gaussians without any inverse map
    """
    xy, radius, valid = pre["xy"], pre["radius"], pre["valid"]
    n = xy.shape[0]
    n_tiles = n_tiles_x * n_tiles_y
    D = max_tiles_per_gaussian
    d_small = min(max(small_tiles, 1), D)
    k_large = min(max_large, n)

    # 1. depth rank per gaussian (invalid sink to the end; argsort is
    # stable, so equal depths tie-break by gaussian id — the CUDA radix
    # order of [tile|depth] keys)
    depth_key = jnp.where(valid, pre["depth"].astype(jnp.float32), jnp.inf)
    order_g = jnp.argsort(depth_key).astype(jnp.int32)          # (N,)
    inv_rank = jnp.argsort(order_g).astype(jnp.int32)           # (N,) rank

    x0, y0, x1, y1 = tile_rect(xy, radius, n_tiles_x, n_tiles_y,
                               tile_w, tile_h)
    rect_w_all = x1 - x0
    counts = jnp.where(valid, rect_w_all * (y1 - y0), 0)
    counts_c = jnp.minimum(counts, D)
    n_pairs_unclamped = jnp.sum(counts).astype(jnp.int32)

    # q_thr: exact-cull threshold — a (gaussian, tile) slot whose MINIMUM
    # conic quadratic over the tile's pixel box keeps alpha strictly below
    # the 1/255 compositor floor contributes EXACTLY ZERO in every backend
    # (alpha_ok fails per pixel), so dropping it is pixel-exact — unlike
    # the CUDA rasterizer's pure 3-sigma circle rect (auxiliary.h getRect),
    # which duplicates such pairs and burns kernel time on them. The 1e-3
    # threshold slack keeps borderline pairs (the kernel decides those).
    q_thr = 2.0 * jnp.log(255.0 * jnp.maximum(pre["opacity"], 1e-12)) + 1e-3

    # the 10 kernel attr lanes, original order (tile_kernel.py layout),
    # optionally compressed to 6 sort-payload lanes (x/y f32 + f16 pairs)
    attrs = jnp.concatenate([
        xy, pre["conic"], pre["opacity"].reshape(-1, 1), pre["rgb"],
        pre["depth"].reshape(-1, 1),
    ], axis=-1).astype(jnp.float32)                             # (N, 10)
    pay_src = (pack_attr_lanes(attrs) if pack_payloads
               else [attrs[:, L] for L in range(N_PAY)])
    n_attr_lanes = len(pay_src)
    if extra_lanes:
        pay_src = pay_src + [jnp.asarray(v) for v in extra_lanes]
    # binning-only per-gaussian quantities (ints < 2^24: exact in f32)
    aux = jnp.stack([
        x0.astype(jnp.float32), y0.astype(jnp.float32),
        rect_w_all.astype(jnp.float32), counts_c.astype(jnp.float32),
        q_thr, inv_rank.astype(jnp.float32),
    ], axis=-1)                                                 # (N, 6)

    # 2. slot emission (no scatter, no permutation): a dense (N, d_small)
    # block covers typical rects; the k_large gaussians with the biggest
    # rects get a continuation block for slots [d_small, D). Both report
    # what they clip.
    def emit(d_lo, d_hi, sel=None):
        # SLOT-MAJOR (d, N) layout: with N in the lane dimension every op
        # runs full-lane; the gaussian-major (N, d) form tiled as d<=16
        # lanes (~10% utilization, 36 ms/step at B=64). Emission order
        # changes but the [tile|rank] sort keys are unique, so the sorted
        # pair stream is bitwise identical.
        d = jnp.arange(d_lo, d_hi, dtype=jnp.int32)[:, None]    # (d, 1)
        if sel is None:
            at, au, ps = attrs, aux, pay_src
        else:
            at, au = attrs[sel], aux[sel]       # two (k, .) row gathers
            # the attr payload lanes are DERIVED from attrs, so re-pack the
            # gathered rows instead of gathering each payload lane — the
            # 6-7 per-lane (k,) gathers were 203 ms/step at the headline
            # scene (round-5 trace, this line). pack_f16_lane on identical
            # f32 inputs is bitwise-identical, so the sorted pair stream
            # (and every golden) is unchanged. Only the extra lanes
            # (exact-depth ride-alongs) still gather.
            ps = (pack_attr_lanes(at) if pack_payloads
                  else [at[:, L] for L in range(N_PAY)])
            ps = ps + [v[sel] for v in pay_src[n_attr_lanes:]]
        xx0 = au[:, 0].astype(jnp.int32)[None, :]
        yy0 = au[:, 1].astype(jnp.int32)[None, :]
        rw = au[:, 2].astype(jnp.int32)
        cnt = au[:, 3].astype(jnp.int32)[None, :]
        qt = au[:, 4][None, :]
        rank = au[:, 5].astype(jnp.int32)[None, :]
        gx = at[:, 0][None, :]
        gy = at[:, 1][None, :]
        rwm = jnp.maximum(rw, 1)[None, :]
        tx = xx0 + d % rwm
        ty = yy0 + d // rwm
        ok = d < cnt

        # exact tile cull: min of q = ca*dx^2 + 2*cb*dx*dy + cc*dy^2 over
        # the tile's pixel box. The PD-quadratic min over a box is either
        # the (clamped) unconstrained optimum or an edge point whose free
        # coordinate is the clamped 1D stationary point — 5 candidates.
        ca = at[:, 2][None, :]
        cb = at[:, 3][None, :]
        cc = jnp.maximum(at[:, 4][None, :], 1e-12)
        caf = jnp.maximum(ca, 1e-12)
        lx = (tx * tile_w).astype(jnp.float32) - gx
        ux = lx + (tile_w - 1)
        ly = (ty * tile_h).astype(jnp.float32) - gy
        uy = ly + (tile_h - 1)

        def q(dx, dy):
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        def cl(v, lo, hi):
            return jnp.clip(v, lo, hi)

        q0 = q(cl(0.0, lx, ux), cl(0.0, ly, uy))
        q1 = q(lx, cl(-cb * lx / cc, ly, uy))
        q2 = q(ux, cl(-cb * ux / cc, ly, uy))
        q3 = q(cl(-cb * ly / caf, lx, ux), ly)
        q4 = q(cl(-cb * uy / caf, lx, ux), uy)
        qmin = jnp.minimum(jnp.minimum(jnp.minimum(q0, q1),
                                       jnp.minimum(q2, q3)), q4)
        ok = ok & (qmin <= qt)

        tile = jnp.where(ok, (ty * n_tiles_x + tx), n_tiles)   # (d, N)
        shape = tile.shape
        rank_b = jnp.broadcast_to(rank, shape)
        pay = [jnp.broadcast_to(v[None, :], shape).reshape(-1) for v in ps]
        return tile.reshape(-1), rank_b.reshape(-1), pay

    m = min(mid_tiles, D) if mid_tiles else 0
    use_mid = m > d_small and max_mid > 0
    parts = [emit(0, d_small)]
    if use_mid:
        # THREE-tier emission: a [d_small, m) continuation for the top
        # ``max_mid`` rects and a [m, D) continuation for the top
        # ``max_large``. Close-up cameras put 20-30% of gaussians past
        # d_small tiles but only ~1% past m, so tiering keeps the sort
        # input near demand instead of granting every big rect D slots.
        # One descending argsort serves both grant tiers.
        k_mid = min(max_mid, n)
        neg = jnp.argsort(-counts_c).astype(jnp.int32)
        sel_mid = neg[:k_mid]
        parts.append(emit(d_small, m, sel_mid))
        extra2 = jnp.maximum(jnp.minimum(counts_c, m) - d_small, 0)
        n_large_dropped = jnp.sum(extra2) - jnp.sum(extra2[sel_mid])
        extra3 = jnp.maximum(counts_c - m, 0)
        if D > m and k_large > 0:
            sel_lg = neg[:k_large]
            parts.append(emit(m, D, sel_lg))
            n_large_dropped = (n_large_dropped + jnp.sum(extra3)
                               - jnp.sum(extra3[sel_lg]))
        else:
            n_large_dropped = n_large_dropped + jnp.sum(extra3)
        n_large_dropped = n_large_dropped.astype(jnp.int32)
    elif D > d_small and k_large > 0:
        _, sel = jax.lax.top_k(counts_c, k_large)
        parts.append(emit(d_small, D, sel.astype(jnp.int32)))
        extra = jnp.maximum(counts_c - d_small, 0)
        n_large_dropped = (jnp.sum(extra) - jnp.sum(extra[sel])
                           ).astype(jnp.int32)
    else:
        n_large_dropped = jnp.sum(
            jnp.maximum(counts_c - d_small, 0)).astype(jnp.int32)
    if len(parts) == 1:
        tile_f, rank_f, pay_f = parts[0]
    else:
        tile_f = jnp.concatenate([p[0] for p in parts])
        rank_f = jnp.concatenate([p[1] for p in parts])
        pay_f = [jnp.concatenate(vs) for vs in zip(*[p[2] for p in parts])]
    # exact-culled slots carry the sentinel tile: count what actually
    # survives (culled pairs are pixel-exact zero, NOT drops)
    n_emitted = jnp.sum(tile_f < n_tiles).astype(jnp.int32)
    n_rect_dropped = (jnp.sum(counts - counts_c).astype(jnp.int32)
                      + n_large_dropped)

    # 3. sort by [tile | depth rank] packed into a unique uint32 key,
    # payloads carrying the attr lanes. Two 5-payload sorts: payload cost
    # is superlinear in count, and unique keys make the two (unstable)
    # permutations identical.
    rank_bits = max((n - 1).bit_length(), 1)
    tile_bits = max(n_tiles.bit_length(), 1)
    assert rank_bits + tile_bits <= 32, \
        f"tile/rank key overflow: {n} gaussians x {n_tiles} tiles"
    key = (tile_f.astype(jnp.uint32) << rank_bits) | rank_f.astype(jnp.uint32)
    if pack_payloads:
        # 6 packed lanes ride ONE sort (payload lanes are the dominant
        # sort cost at ~2 ns/lane/key)
        out = jax.lax.sort((key,) + tuple(pay_f), num_keys=1,
                           is_stable=False)
        key_s = out[0]
        lanes = list(out[1:])
    else:
        # one merged 10-payload sort: XLA CSEs the two 5-payload sorts into
        # it anyway, and forcing a split with an optimization barrier
        # measured WORSE on chip (68 ms vs 61 at wrist scale) despite
        # isolated micro benchmarks suggesting otherwise
        out_a = jax.lax.sort((key,) + tuple(pay_f[:5]), num_keys=1,
                             is_stable=False)
        out_b = jax.lax.sort((key,) + tuple(pay_f[5:]), num_keys=1,
                             is_stable=False)
        key_s = out_a[0]
        lanes = list(out_a[1:]) + list(out_b[1:])
    extra_s = lanes[n_attr_lanes:]
    lanes = lanes[:n_attr_lanes]

    # 4. crop/pad to the static pair budget + tile ranges. Pad rows are
    # all-zero (dead opacity).
    total = tile_f.shape[0]
    if total >= max_pairs:
        key_s = key_s[:max_pairs]
        lanes = [v[:max_pairs] for v in lanes]
        extra_s = [v[:max_pairs] for v in extra_s]
    else:
        pad = max_pairs - total
        key_s = jnp.pad(key_s, (0, pad),
                        constant_values=jnp.uint32(n_tiles << rank_bits))
        lanes = [jnp.pad(v, (0, pad)) for v in lanes]
        extra_s = [jnp.pad(v, (0, pad)) for v in extra_s]
    tiles_sorted = (key_s >> rank_bits).astype(jnp.int32)
    if pack_payloads:
        lanes = unpack_attr_lanes(lanes)   # post-sort: back to 10 f32 lanes
    # the lanes stay UNSTACKED: a stacked (P, 16) attr table takes an
    # attr-minor {.,.,attr} layout under vmap and tiles 16 lanes into 128
    # (8x HBM padding — 9.2 GB and an OOM at the 100k-gaussian bench
    # scale). Consumers build their packed form straight from the lanes
    # (pack_pair_rows / gather_pair_table's transposing lax.reshape).

    # one searchsorted over [0..n_tiles] gives both range ends: pairs of
    # tile t occupy [starts[t], starts[t+1]) in the sorted stream (the
    # second side="right" search cost as much again)
    bounds = jnp.searchsorted(tiles_sorted,
                              jnp.arange(n_tiles + 1, dtype=jnp.int32),
                              side="left").astype(jnp.int32)
    starts = bounds[:-1]
    ends = bounds[1:]

    out = {
        "pair_lanes": lanes,           # 10 (max_pairs,) sorted attr lanes
        "pair_tile": tiles_sorted,     # (max_pairs,) tile id per sorted pair
        "tile_starts": starts,
        "tile_ends": ends,
        "n_pairs": jnp.minimum(n_emitted, max_pairs).astype(jnp.int32),
        "n_pairs_unclamped": n_pairs_unclamped,
        "n_large_dropped": (n_rect_dropped
                            + jnp.maximum(n_emitted - max_pairs, 0)
                            ).astype(jnp.int32),
    }
    if extra_lanes:
        out["extra_sorted"] = extra_s
    return out
