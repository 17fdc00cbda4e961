"""Incremental (dirty-tile) splat rendering for fixed cameras.

The reference re-renders every pixel of every camera every control step
(sim/envs/env.py:53-74 -> gs_renderer.py render path). On TPU at 64
lockstep envs that makes the compositor ~90% of the step, yet for the
FIXED cameras almost all of every frame is constant: the scene-scan
gaussians (table + attached meshes + non-articulated scan splats) move
neither across control steps nor across environments — only the object
splats (LBS on the particle state) and the robot-link splats do.

So, per fixed camera:

  build (once per episode batch)
    - preprocess + tile-bin the static gaussians -> a frozen, depth-sorted
      static pair stream (pair table, per-tile [start, end), per-pair depth)
    - composite it once -> cached static RGB/depth frames

  step (per env)
    - preprocess + bin ONLY the dynamic gaussians (object + robot)
    - a tile is DIRTY iff it receives >= 1 dynamic pair; clean tiles keep
      their cached pixels (their pair set is IDENTICAL to the static-only
      render, so the result is exact by construction, not an approximation)
    - for each dirty tile, merge the static segment with the dynamic pairs
      by view depth (vectorized per-pair binary search into the static
      stream) and gather the merged slice into a compact mix table
    - one sparse Pallas launch re-composites the dirty tiles in place on
      top of the cached frames (tile_kernel.rasterize_tiles_sparse)

Ordering parity: the full-sort path orders equal-depth pairs by gaussian
index (stable argsort). The merge inserts dynamic pairs BEFORE equal-depth
static pairs, which matches the full sort of a scene concatenated
[dynamic; static] — tests compare against exactly that ordering.

Static budgets (both report their drops, binning.py's
no-silent-under-render rule): ``t_budget`` dirty tiles per instance and
``p_mix`` merged pairs per instance; overflow counts are telemetry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .binning import bin_gaussians
from .camera import Camera
from .preprocess import preprocess_gaussians
from .raster import (ALPHA_MAX, ALPHA_MIN, T_EPS, TILE_H, TILE_W,
                     RasterConfig, gather_pair_attrs)
from .tile_kernel import (ATTR, GPR, rasterize_tiles_batch,
                          rasterize_tiles_sparse)

DEPTH_LANE = 9   # depth lives in lane 9 of the packed pair attrs


def merge_chunk_size(config: RasterConfig, n_dyn: int, p_mix: int,
                     n_inst: int, fine: bool = False) -> int:
    """Instances per merge+composite launch, bounded by live-table bytes.

    Each instance materializes ~(mp_d + p_mix) x ATTR f32 of merge tables
    (dyn pair attrs + the mix). At scan-scale dynamic objects that is
    tens of MB per instance — 64 envs x 2 cams at once allocated 22 GB
    on a 16 GB v5e (round-4 OOM). Chunking instances through the merge +
    sparse compositor bounds the peak while each chunk still fills the
    chip (hundreds of dirty tiles x instances per launch)."""
    if fine:
        mp_d = (config.fine_pairs_override
                or int(config.fine_pairs_factor * n_dyn))
    else:
        mp_d = (config.max_pairs_override
                or int(config.max_pairs_factor * n_dyn))
    per_inst = (mp_d + p_mix) * ATTR * 4
    return max(1, min(n_inst,
                      int(config.merge_mem_budget) // max(per_inst, 1)))


def chunked_incremental(render_fn, cam_static_w2c, dyn_scenes, sh_degree,
                        config, t_budget, p_mix, bg, chunk_b: int):
    """Run ``render_fn`` (render_incremental{,_fine}) over env chunks via
    lax.map so only one chunk's merge tables are live at a time. The body
    compiles once; the tail chunk is padded with env 0 and sliced off."""
    B = dyn_scenes["means3D"].shape[0]
    n_chunks = -(-B // chunk_b)
    Bp = n_chunks * chunk_b

    def pad(v):
        if Bp == B:
            return v
        return jnp.concatenate(
            [v, jnp.broadcast_to(v[:1], (Bp - B,) + v.shape[1:])], axis=0)

    xs = {k: pad(v).reshape((n_chunks, chunk_b) + v.shape[1:])
          for k, v in dyn_scenes.items()}

    def body(sl):
        return render_fn(cam_static_w2c, sl, sh_degree, config,
                         t_budget=t_budget, p_mix=p_mix, bg=bg)

    rgb, dep, tele = jax.lax.map(body, xs)

    def unc(v):                    # (n_chunks, n_cams, chunk_b, ...) ->
        v = jnp.moveaxis(v, 0, 1)  # (n_cams, B, ...)
        return v.reshape((v.shape[0], Bp) + v.shape[3:])[:, :B]

    return unc(rgb), unc(dep), unc(tele)


def _static_cutoff(attrs, starts, ends, ntx, nty, max_seg,
                   tile_w: int = TILE_W, tile_h: int = TILE_H):
    """Per-tile count of leading static pairs that can EVER contribute.

    Front-to-back transmittance saturates: once every pixel of a tile is
    dead (T < T_EPS or frozen by the would-done rule), no later pair in
    the stream contributes. Inserting dynamic pairs into the stream can
    only lower T pointwise / freeze pixels earlier (alpha-compositing is
    monotone), so pairs beyond the STATIC-ONLY saturation point are dead
    in every merged stream too — truncating the merge ranges there is
    pixel-exact, and on dense close-up scans (a table fills a tile with
    hundreds of splats) it cuts the per-tile merge stream by ~an order of
    magnitude. One-time cost at episode-batch build.
    """
    n_tiles = ntx * nty
    p_s = attrs.shape[0]
    t_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    px = ((t_ids % ntx)[:, None, None] * tile_w
          + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tile_w), 2)
          ).astype(jnp.float32)
    py = ((t_ids // ntx)[:, None, None] * tile_h
          + jax.lax.broadcasted_iota(jnp.int32, (1, tile_h, tile_w), 1)
          ).astype(jnp.float32)

    def body(carry, p):
        T, done = carry
        idx = jnp.minimum(starts + p, p_s - 1)
        row = attrs[idx]                                  # (n_tiles, ATTR)
        in_r = ((starts + p) < ends)[:, None, None]
        live = jnp.max(T * (1.0 - done), axis=(1, 2)) >= T_EPS

        def a(i):
            return row[:, i][:, None, None]

        dx = a(0) - px
        dy = a(1) - py
        power = -0.5 * (a(2) * dx * dx + a(4) * dy * dy) - a(3) * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, a(5) * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & in_r, alpha, 0.0)
        alpha_ok = alpha >= ALPHA_MIN
        test_T = T * (1.0 - alpha)
        would_done = alpha_ok & (test_T < T_EPS)
        contrib = alpha_ok & (~would_done) & (done < 0.5)
        T = jnp.where(contrib, test_T, T)
        done = jnp.maximum(done, jnp.where(would_done, 1.0, 0.0))
        used = live & ((starts + p) < ends)
        return (T, done), used

    shape = (n_tiles, tile_h, tile_w)
    init = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    _, used = jax.lax.scan(body, init, jnp.arange(max_seg, dtype=jnp.int32))
    return jnp.sum(used.astype(jnp.int32), axis=0)        # (n_tiles,)


@dataclasses.dataclass(frozen=True)
class StaticRaster:
    """Frozen static-scene raster state for ONE fixed camera."""

    data_pairs: jax.Array     # (P_s, ATTR) depth-sorted-per-tile attr rows
    pair_depth: jax.Array     # (P_s,) view depth per static pair
    starts: jax.Array         # (n_tiles,) pair range per tile
    ends: jax.Array           # (n_tiles,)
    rgb_cache: jax.Array      # (3, h_pad + TILE_H, w_pad) incl. junk row
    depth_cache: jax.Array    # (h_pad + TILE_H, w_pad)
    n_tiles_x: int
    n_tiles_y: int
    max_seg: int              # longest static per-tile segment (host int)
    height: int
    width: int


def build_static_raster(cam: Camera, w2c, scene: dict, sh_degree: int,
                        config: RasterConfig, bg=(0.0, 0.0, 0.0)
                        ) -> StaticRaster:
    """Preprocess + bin + composite the static gaussians once."""
    n = scene["means3D"].shape[0]
    ntx = -(-cam.width // TILE_W)
    nty = -(-cam.height // TILE_H)
    # one-time build: buffer size costs nothing per step here, so keep a
    # generous floor regardless of the (runtime-tuned) config factor.
    # When the STATIC family was budget-calibrated (renderer/calibrate.py
    # via measure_and_plan), its override is the measured demand x margin
    # for exactly this scene — honor it (still floored at the generous
    # default: the build is one-time, under-sizing here raises below).
    max_pairs = int(max(config.max_pairs_factor, 6.0) * n)
    if config.max_pairs_override:
        max_pairs = max(max_pairs, int(config.max_pairs_override))
    max_pairs = -(-max_pairs // config.chunk) * config.chunk
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))

    shs = scene["shs"] if sh_degree > 0 else scene["shs"][:, :1]
    pre = preprocess_gaussians(cam, jnp.asarray(w2c, jnp.float32),
                               scene["means3D"], scene["scales"],
                               scene["rotations"], scene["opacities"],
                               shs, sh_degree)
    # pass the FULL planned tier set: plan_tiers may pick a three-tier
    # split (mid_tiles/max_mid) in which max_large only covers demand
    # beyond the MID cap — binning two-tier against such a plan drops
    # mid-band pairs and trips the loud ValueError below on exactly the
    # scenes the optimizer picked three tiers for
    bins = bin_gaussians(pre, ntx, nty, TILE_W, TILE_H, max_pairs,
                         config.max_tiles_per_gaussian,
                         small_tiles=max(config.small_tiles, 8),
                         # exactness contract: the merge's tie rule (dynamic
                         # before equal-depth static) reproduces the full
                         # sort's RANK order only on unquantized depths, so
                         # this path never packs payloads (its per-step
                         # dynamic sort is small; the big sorts are the
                         # wrist/full pipeline's)
                         max_large=config.max_large, pack_payloads=False,
                         mid_tiles=config.mid_tiles, max_mid=config.max_mid)
    # the static cache is served for the WHOLE episode: a cropped build
    # would silently corrupt every clean tile, so drops fail loudly here
    # (one-time host sync; per-step paths report via telemetry)
    n_drop = int(jax.device_get(bins["n_large_dropped"]))
    if n_drop:
        raise ValueError(
            f"static raster build dropped {n_drop} pairs — raise "
            "max_pairs_factor/max_tiles_per_gaussian/max_large (calibrate "
            "the static family, renderer/calibrate.py)")
    attrs = gather_pair_attrs(pre, bins, n)                   # (P_s, ATTR)
    depth = jnp.where(bins["pair_tile"] < ntx * nty,
                      attrs[:, DEPTH_LANE], jnp.inf)
    packed = attrs.reshape(-1, GPR * ATTR)
    rgb, dep = rasterize_tiles_batch(
        packed, bins["tile_starts"][None], bins["tile_ends"][None],
        ntx, nty, chunk=config.chunk, bg=bg, interpret=config.interpret)
    pad = ((0, 0), (0, TILE_H), (0, 0))
    max_seg = int(jax.device_get(
        jnp.max(bins["tile_ends"] - bins["tile_starts"])))
    # saturation truncation: merge streams only ever need the pairs that
    # can still contribute once the tile's transmittance budget is spent
    k_sat = _static_cutoff(attrs, bins["tile_starts"], bins["tile_ends"],
                           ntx, nty, max_seg)
    ends_trunc = bins["tile_starts"] + k_sat
    max_seg = int(jax.device_get(jnp.max(k_sat)))
    return StaticRaster(
        data_pairs=attrs, pair_depth=depth,
        starts=bins["tile_starts"], ends=ends_trunc,
        rgb_cache=jnp.pad(rgb[0], ((0, 0),) + pad[1:]),
        depth_cache=jnp.pad(dep[0], pad[1:]),
        n_tiles_x=ntx, n_tiles_y=nty, max_seg=max_seg,
        height=cam.height, width=cam.width)


def _merge_core(static, n_tiles: int, cnt_d, bin_tile_starts, tile_d,
                d_attr, slot_tile, real, inb_t, p_mix: int):
    """Tile-size-agnostic merge of dynamic pairs into frozen static streams.

    Shared by the wide path (slots = dirty tiles) and the fine-sparse path
    (slots = the 8 fine tiles of each dirty supertile — possibly with NO
    dynamic pairs of their own). Args:
      static: StaticRaster-like (starts, ends, pair_depth, data_pairs,
        max_seg) over ``n_tiles`` tiles.
      cnt_d: (n_tiles,) dynamic pair count per tile.
      bin_tile_starts: (n_tiles,) dynamic stream starts per tile.
      tile_d / d_attr: (P_d,) sorted dynamic pair tiles + (P_d, ATTR) rows.
      slot_tile: (n_slots,) ascending tile ids to re-composite (sentinels
        >= n_tiles).
      real: (n_slots,) slot_tile < n_tiles.
      inb_t: (n_tiles,) tile belongs to an in-budget slot.
    Returns (mix (p_mix, ATTR), starts_m, ends_m, total, off).
    """
    p_s = static.data_pairs.shape[0]
    p_d = tile_d.shape[0]
    depth_d = d_attr[:, DEPTH_LANE]
    valid_d = tile_d < n_tiles

    # --- merged insert position: leftmost static pair with depth >= d ----
    t_cl = jnp.minimum(tile_d, n_tiles - 1)
    lo = static.starts[t_cl]
    hi = static.ends[t_cl]
    iters = max(static.max_seg, 1).bit_length()

    # unrolled: iters is small and static, and a lax loop pays per-trip
    # scheduling for ~1 gather + 2 selects of work.
    # GUARD every trip on lo < hi: the fixed trip count keeps executing
    # after convergence, and once lo == hi == ends the probe reads the
    # NEXT tile's first pair — if that is shallower than d, lo walks past
    # ends, shifting out_j and corrupting the next slot's first rows
    # (surfaced by scan-scale dynamic objects whose deepest splats sink
    # below every static pair of their tile; tests/test_incremental.py
    # ::test_merge_dyn_deeper_than_all_static)
    for _ in range(iters):
        active = lo < hi
        mid = (lo + hi) // 2
        v = static.pair_depth[jnp.minimum(mid, p_s - 1)]
        go = active & (v < depth_d)
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(active & ~go, mid, hi)
    insert = lo

    t_safe = jnp.minimum(slot_tile, n_tiles - 1)
    len_s = jnp.where(real, static.ends[t_safe] - static.starts[t_safe], 0)
    len_dd = jnp.where(real, cnt_d[t_safe], 0)
    length = len_s + len_dd
    csum = jnp.cumsum(length)
    off = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
    total = csum[-1]

    # --- dynamic pairs -> mix slots ---------------------------------------
    # slot order == ascending tile order, so per-TILE offset/membership
    # arrays replace the per-pair searchsorted into the slot list (traced
    # at 43 ms/step): one packed (n_tiles,) cumsum + ONE gather per pair.
    # off_neg[t] = mix offset of tile t's slot, or -1 if not re-composited.
    len_t = jnp.where(inb_t,
                      (static.ends - static.starts) + cnt_d, 0)
    off_t = jnp.cumsum(len_t) - len_t
    off_neg = jnp.where(inb_t, off_t, -1)
    off_pair = off_neg[t_cl]
    in_budget = (off_pair >= 0) & valid_d
    j_idx = jnp.arange(p_d, dtype=jnp.int32)
    out_j = (off_pair + (insert - static.starts[t_cl])
             + (j_idx - bin_tile_starts[t_cl]))
    ok_j = in_budget & (out_j < p_mix)
    tgt = jnp.where(ok_j, out_j, p_mix)                      # drop slot
    mark = jnp.zeros((p_mix,), jnp.int32).at[tgt].set(1, mode="drop")

    # --- static fill between the inserted dynamic pairs -------------------
    # the static index at position p of slot d is
    #   s_idx(p) = starts_s[t_d] + (p - off_d) - (c_ex(p) - c_ex(off_d))
    #            = A_d + p - c_ex(p),  A_d = starts_s[t_d] - off_d + c_ex(off_d)
    # A is NON-DECREASING over ascending real slots (A_{d+1} - A_d equals
    # the static-stream gap starts_s[t_{d+1}] - ends_s[t_d] >= 0), so a
    # scatter of A at each slot's start offset + a cummax forward-fill
    # replaces per-position slot lookups (log-depth gathers over p_mix
    # rows, serialized on TPU). Zero-LENGTH slots (fine-sparse: a clean,
    # static-empty fine tile of a dirty supertile) share their seed offset
    # with the next slot; .at[].max + non-decreasing A keeps the owner of
    # each position correct (the positive-length slot is last in any
    # equal-offset run). Sentinel slots seed -BIG which never wins.
    pos = jnp.arange(p_mix, dtype=jnp.int32)
    c_ex = jnp.cumsum(mark) - mark                           # dyn slots < p
    off_cl = jnp.minimum(off, p_mix - 1)
    big = jnp.int32(1 << 30)
    a_slot = static.starts[t_safe] - off + jnp.take(c_ex, off_cl)
    # slots fully past the pair budget route to the drop index p_mix:
    # clamping them to p_mix-1 could beat the legitimate seed there and
    # compose a wrong static row at the last in-budget tile's final mix
    # position (an already-degraded regime, but keep it sane)
    seed_idx = jnp.where(off < p_mix, off, p_mix)
    seeded = jnp.full((p_mix,), -big, jnp.int32).at[seed_idx].max(
        jnp.where(real, a_slot, -big), mode="drop")
    a_at = jax.lax.cummax(seeded)
    s_idx = a_at + pos - c_ex
    in_use = (pos < total) & (s_idx >= 0) & (mark == 0)

    # materialize the mix: static rows come from the SHARED frozen table
    # (shared-source gathers run ~3 ns/row vs ~35 ns/row for a
    # batched-source table under vmap), then the dynamic attr rows are
    # row-scattered onto their slots (~7 ns/row over just P_d rows) —
    # together an order of magnitude cheaper than gathering every mix row
    # from a per-env concatenated [static; dynamic] table.
    mix = jnp.where(in_use[:, None],
                    static.data_pairs[jnp.clip(s_idx, 0, p_s - 1)], 0.0)
    mix = mix.at[tgt].set(d_attr, mode="drop")               # (p_mix, ATTR)

    starts_m = jnp.minimum(off, p_mix).astype(jnp.int32)
    ends_m = jnp.minimum(off + length, p_mix).astype(jnp.int32)
    return mix, starts_m, ends_m, total, off


def _merge_one_env(static: StaticRaster, pre: dict, n_dyn: int,
                   config: RasterConfig, t_budget: int, p_mix: int):
    """Per-env merge of the dynamic pairs into the static stream.

    Returns (mix_attrs (p_mix, ATTR), dirty_ids (t_budget,),
    starts/ends (t_budget,), telemetry (4,) i32 =
    [n_dirty, dropped_tiles, dropped_pairs, binning_dropped])."""
    ntx, nty = static.n_tiles_x, static.n_tiles_y
    n_tiles = ntx * nty
    max_pairs_d = (config.max_pairs_override
                   or int(config.max_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR

    bins = bin_gaussians(pre, ntx, nty, TILE_W, TILE_H, max_pairs_d,
                         config.max_tiles_per_gaussian,
                         small_tiles=config.small_tiles,
                         max_large=config.max_large, pack_payloads=False,
                         mid_tiles=config.mid_tiles,
                         max_mid=config.max_mid)
    d_attr = gather_pair_attrs(pre, bins, n_dyn)             # (P_d, ATTR)

    # --- dirty tiles, compacted ascending ---------------------------------
    cnt_d = bins["tile_ends"] - bins["tile_starts"]          # (n_tiles,)
    dirty = cnt_d > 0
    n_dirty = jnp.sum(dirty.astype(jnp.int32))
    keys = jnp.where(dirty, jnp.arange(n_tiles, dtype=jnp.int32),
                     jnp.int32(n_tiles))
    dirty_ids = jax.lax.sort(keys)[:t_budget]
    real = dirty_ids < n_tiles
    d_rank = jnp.cumsum(dirty.astype(jnp.int32)) - dirty.astype(jnp.int32)
    inb_t = dirty & (d_rank < t_budget)

    mix, starts_m, ends_m, total, _ = _merge_core(
        static, n_tiles, cnt_d, bins["tile_starts"], bins["pair_tile"],
        d_attr, dirty_ids, real, inb_t, p_mix)
    over_pairs = jnp.maximum(total - p_mix, 0)
    over_tiles = jnp.maximum(n_dirty - t_budget, 0)
    tele = jnp.stack([n_dirty, over_tiles, over_pairs,
                      bins["n_large_dropped"]]).astype(jnp.int32)
    return mix, dirty_ids, starts_m, ends_m, tele


def render_incremental(cam_static_w2c: list, dyn_scenes: dict,
                       sh_degree: int, config: RasterConfig,
                       t_budget: int = 96, p_mix: int = 32768,
                       bg=(0.0, 0.0, 0.0)):
    """Render B envs x n fixed cameras incrementally.

    Args:
      cam_static_w2c: list of (Camera, StaticRaster, w2c (4,4)) per fixed
        camera (all same resolution).
      dyn_scenes: dict of stacked (B, N_dyn, ...) DYNAMIC gaussians only.
    Returns:
      (rgb (n_cams, B, 3, h, w) clipped, depth (n_cams, B, h, w),
       telemetry (n_cams, B, 4) i32 [n_dirty, dropped_tiles, dropped_pairs,
       binning_dropped])
    """
    assert cam_static_w2c
    cam0, st0, _ = cam_static_w2c[0]
    h, w = cam0.height, cam0.width
    ntx, nty = st0.n_tiles_x, st0.n_tiles_y
    B = dyn_scenes["means3D"].shape[0]
    n_dyn = dyn_scenes["means3D"].shape[1]
    p_mix = -(-p_mix // GPR) * GPR
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))
    n_inst_all = B * len(cam_static_w2c)
    chunk_b = max(1, merge_chunk_size(config, n_dyn, p_mix, n_inst_all)
                  // len(cam_static_w2c))
    if chunk_b < B:
        return chunked_incremental(render_incremental, cam_static_w2c,
                                   dyn_scenes, sh_degree, config,
                                   t_budget, p_mix, bg, chunk_b)
    shs = dyn_scenes["shs"] if sh_degree > 0 else dyn_scenes["shs"][:, :, :1]

    mixes, dids, starts, ends, teles, caches_rgb, caches_dep = \
        [], [], [], [], [], [], []
    for cam, static, w2c in cam_static_w2c:
        assert (cam.height, cam.width) == (h, w)

        def one(means, scales, quats, opac, sh, _cam=cam, _st=static,
                _w2c=jnp.asarray(w2c, jnp.float32)):
            pre = preprocess_gaussians(_cam, _w2c, means, scales, quats,
                                       opac, sh, sh_degree)
            return _merge_one_env(_st, pre, n_dyn, config, t_budget, p_mix)

        m, d, s, e, t = jax.vmap(one)(
            dyn_scenes["means3D"], dyn_scenes["scales"],
            dyn_scenes["rotations"], dyn_scenes["opacities"], shs)
        mixes.append(m)
        dids.append(d)
        starts.append(s)
        ends.append(e)
        teles.append(t)
        caches_rgb.append(jnp.broadcast_to(
            static.rgb_cache[None], (B,) + static.rgb_cache.shape))
        caches_dep.append(jnp.broadcast_to(
            static.depth_cache[None], (B,) + static.depth_cache.shape))

    mix = jnp.concatenate(mixes, axis=0)          # (I, p_mix, ATTR)
    n_inst = mix.shape[0]
    data = mix.reshape(-1, GPR * ATTR)
    inst_off = (jnp.arange(n_inst, dtype=jnp.int32) * p_mix)[:, None]
    starts = jnp.concatenate(starts, axis=0) + inst_off
    ends = jnp.concatenate(ends, axis=0) + inst_off
    dirty_ids = jnp.concatenate(dids, axis=0)

    rgb, depth = rasterize_tiles_sparse(
        data, dirty_ids, starts, ends,
        jnp.concatenate(caches_rgb, axis=0),
        jnp.concatenate(caches_dep, axis=0),
        ntx, nty, chunk=config.chunk, bg=bg, interpret=config.interpret)

    n_cams = len(cam_static_w2c)
    rgb = jnp.clip(rgb[:, :, :h, :w], 0.0, 1.0).reshape(n_cams, B, 3, h, w)
    depth = depth[:, :h, :w].reshape(n_cams, B, h, w)
    tele = jnp.stack(teles, axis=0)
    return rgb, depth, tele
