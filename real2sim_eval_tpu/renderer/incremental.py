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
    - merge BY SORT: compact the dirty tiles' truncated static segments
      into a fill stream (seeded-cummax index construction, one shared
      -source row gather), then ONE lax.sort of [static fill; dynamic
      pairs] keyed (tile, depth, origin-flag) carrying the 10 attr lanes
      as payloads — the sorted payloads ARE the merged pair table
    - one sparse Pallas launch re-composites the dirty tiles in place on
      top of the cached frames (tile_kernel.rasterize_tiles_sparse)

The round-4 merge computed insert positions with a per-dynamic-pair
binary search into the static stream and materialized the mix via
gather + scatter; at scan-scale dynamic objects (30k splats, 221k pair
slots/instance) the search gathers and the mix materialization were 77%
of the whole step (round-5 trace). The sort rides the TPU's one fast
irregular-data mechanism (~2 ns/key/lane) and needs no insert positions
at all.

Ordering parity: the full-sort path orders equal-depth pairs by gaussian
index (stable argsort of the [dynamic; static] concatenation). The merge
sort's key is (tile, depth, flag) with flag = stream position for dynamic
pairs and 2^30 + stream position for static pairs — at equal (tile,
depth) every dynamic pair precedes every static pair (dyn indices come
first in the concat) and pairs of one stream keep their own stable order,
which IS the full sort's order. Tests compare bitwise against exactly
that ordering.

Static budgets (both report their drops, binning.py's
no-silent-under-render rule): ``t_budget`` dirty tiles per instance and
``p_mix`` static-fill pairs per instance (dynamic pairs always fit — the
binning buffer already bounds and reports them); overflow counts are
telemetry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .binning import N_PAY as N_LANES
from .binning import bin_gaussians
from .camera import Camera
from .preprocess import preprocess_gaussians
from .raster import (ALPHA_MAX, ALPHA_MIN, T_EPS, TILE_H, TILE_W,
                     RasterConfig, gather_pair_attrs)
from .tile_kernel import (ATTR, GPR, rasterize_tiles_batch,
                          rasterize_tiles_sparse,
                          rasterize_tiles_sparse_merge)

DEPTH_LANE = 9   # depth lives in lane 9 of the packed pair attrs


def merge_chunk_size(config: RasterConfig, n_dyn: int, p_mix: int,
                     n_inst: int, fine: bool = False) -> int:
    """Instances per merge+composite launch, bounded by live-table bytes.

    Each instance's merge sort holds ~(p_mix + mp_d) rows x (3 keys + 10
    payload lanes) f32, double-buffered, plus the packed kernel table
    (GPR*ATTR lanes / 8 pairs). At scan-scale dynamic objects that is
    tens of MB per instance; chunking instances through merge + sparse
    compositor bounds the peak while each chunk still fills the chip."""
    if fine:
        mp_d = (config.fine_pairs_override
                or int(config.fine_pairs_factor * n_dyn))
    else:
        mp_d = (config.max_pairs_override
                or int(config.max_pairs_factor * n_dyn))
    per_inst = (mp_d + p_mix) * (13 * 4 * 2 + ATTR * 4)
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
    pair_tile: jax.Array      # (P_s,) i32 tile id per pair (pad: n_tiles)
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
        data_pairs=attrs, pair_depth=depth, pair_tile=bins["pair_tile"],
        starts=bins["tile_starts"], ends=ends_trunc,
        rgb_cache=jnp.pad(rgb[0], ((0, 0),) + pad[1:]),
        depth_cache=jnp.pad(dep[0], pad[1:]),
        n_tiles_x=ntx, n_tiles_y=nty, max_seg=max_seg,
        height=cam.height, width=cam.width)


def _merge_core(static, n_tiles: int, cnt_d, tile_d, d_lanes,
                slot_tile, real, gate_d, p_stat: int,
                pack_sort: bool = False, depth_d_key=None):
    """Tile-size-agnostic merge of dynamic pairs into frozen static streams.

    Shared by the wide path (slots = dirty tiles) and the fine-sparse path
    (slots = the dirty fine tiles of each dirty supertile). Merge BY SORT:

      1. compact the participating tiles' truncated static segments into a
         fill stream of capacity ``p_stat`` (seeded-cummax index
         construction — the static index at position p of slot d is
         A_d + p with A_d = starts_s[t_d] - off_d, non-decreasing over
         ascending real slots, so one scatter + cummax recovers it), then
         ONE shared-source row gather materializes the fill;
      2. ONE lax.sort of [static fill; dynamic pairs] keyed
         (tile, depth, flag) with the 10 attr lanes as payloads. flag =
         own-stream position for dynamic pairs, 2^30 + position for
         static — at equal (tile, depth) every dynamic pair precedes
         every static pair and each stream keeps its stable order, which
         is EXACTLY the full pipeline's stable depth argsort of the
         [dynamic; static] concatenation.

    Args:
      static: StaticRaster-like (starts, ends, pair_depth, pair_tile,
        data_pairs) over ``n_tiles`` tiles (ends already truncated at the
        saturation cutoff).
      cnt_d: (n_tiles,) dynamic pair count per tile.
      tile_d: (P_d,) sorted dynamic pair tile ids (sentinel n_tiles).
      d_lanes: list of 10 (P_d,) f32 dynamic attr lanes (binning payload
        order; depth = lane 9).
      slot_tile: (n_slots,) ascending tile ids to re-composite (sentinels
        >= n_tiles).
      real: (n_slots,) slot participates (tile valid AND, on the fine
        path, actually dirty).
      gate_d: (P_d,) pair participates (its tile is valid AND belongs to
        an in-budget slot). Callers derive it from the tile-sorted pair
        stream itself (segment-boundary cumsum) — a per-pair gather into
        a per-tile table was 0.5 s/step at the flagship scene (round-5
        trace, 28M pair rows x 2 fixed cams x 64 envs).
      pack_sort: f16-pack the 8 non-xy payload lanes through the sort
        (production; ~5e-4 relative attr error, order unaffected — the
        keys stay f32/i32). Exactness tests run unpacked.
      depth_d_key: optional (P_d,) EXACT f32 view depth per dynamic pair
        for the sort KEY. When the dynamic binning packed its payloads,
        the depth VALUE lane d_lanes[9] is f16-quantized — keying the
        merge on it orders quantized dynamic depths against unquantized
        static depths, flipping near-coplanar dyn/static pairs that the
        full pipeline (whose rank comes from exact depths BEFORE
        packing) never flips. Callers on the packed path must ride the
        exact depth through binning's ``extra_lanes`` and pass it here;
        the value lane stays quantized (matching the full packed
        pipeline bitwise).
    Returns (lanes [10 x (p_stat + P_d,)], starts_m, ends_m, total,
    n_stat_dropped).

    Degraded-loud contract: when the static fill demand exceeds
    ``p_stat``, the fill keeps its PREFIX (slots up to the overflow point
    stay exact) and later participating tiles compose without some static
    rows; ``n_stat_dropped`` reports it and the bench gate fails the run.
    """
    p_s = static.data_pairs.shape[0]
    p_d = tile_d.shape[0]

    t_safe = jnp.minimum(slot_tile, n_tiles - 1)
    len_s = jnp.where(real, static.ends[t_safe] - static.starts[t_safe], 0)
    len_dd = jnp.where(real, cnt_d[t_safe], 0)
    length = len_s + len_dd
    csum = jnp.cumsum(length)
    off = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
    total = csum[-1]

    # --- static fill (compact the participating truncated segments) -------
    csum_s = jnp.cumsum(len_s)
    off_s = jnp.concatenate([jnp.zeros((1,), csum_s.dtype), csum_s[:-1]])
    total_s = csum_s[-1]
    pos = jnp.arange(p_stat, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    a_slot = static.starts[t_safe] - off_s
    # zero-length slots share their seed offset with the next slot;
    # .at[].max + non-decreasing A keeps the owner of each position
    # correct (the positive-length slot is last in any equal-offset run).
    # Sentinel slots seed -BIG which never wins; slots past the fill
    # budget route to the drop index p_stat.
    seed_idx = jnp.where(off_s < p_stat, off_s, p_stat)
    seeded = jnp.full((p_stat,), -big, jnp.int32).at[seed_idx].max(
        jnp.where(real, a_slot, -big), mode="drop")
    a_at = jax.lax.cummax(seeded)
    s_idx = a_at + pos
    in_use = (pos < jnp.minimum(total_s, p_stat)) & (s_idx >= 0)
    s_cl = jnp.clip(s_idx, 0, p_s - 1)
    rows_s = jnp.where(in_use[:, None], static.data_pairs[s_cl], 0.0)
    # fill-position tile ids by the SAME seeded-cummax (slot_tile is
    # ascending over real slots, exactly like a_slot): the per-position
    # pair_tile gather this replaces was 109 ms/step at the headline
    # scene (round-5 trace) for one payload lane
    seeded_t = jnp.full((p_stat,), -big, jnp.int32).at[seed_idx].max(
        jnp.where(real, t_safe, -big), mode="drop")
    tile_s = jnp.where(in_use, jax.lax.cummax(seeded_t), n_tiles)
    depth_s = jnp.where(in_use, rows_s[:, DEPTH_LANE], jnp.inf)
    flag_s = jnp.where(in_use, big + s_idx, big + big // 2)

    # --- dynamic side (already sorted by [tile | depth rank]) --------------
    tile_d_g = jnp.where(gate_d, tile_d, n_tiles)
    d_key = d_lanes[DEPTH_LANE] if depth_d_key is None else depth_d_key
    depth_d = jnp.where(gate_d, d_key, jnp.inf)
    flag_d = jnp.arange(p_d, dtype=jnp.int32)

    # --- ONE merge sort ----------------------------------------------------
    k_tile = jnp.concatenate([tile_s, tile_d_g]).astype(jnp.int32)
    k_depth = jnp.concatenate([depth_s, depth_d]).astype(jnp.float32)
    k_flag = jnp.concatenate([flag_s, flag_d]).astype(jnp.int32)
    pay = [jnp.concatenate([rows_s[:, a], d_lanes[a]])
           for a in range(N_LANES)]
    if pack_sort:
        # payload lanes dominate the sort cost (~2 ns/lane/key): x/y stay
        # f32 (sub-pixel conic accuracy), the other 8 ride as 4 f16-packed
        # u32 lanes. Order is UNAFFECTED — the keys stay f32/i32 — so the
        # merge tie rule holds exactly even packed (unlike the round-4
        # rank-quantization constraint that forced this path unpacked).
        from .binning import pack_f16_lane, unpack_f16_lane
        packed = [pack_f16_lane(pay[a], pay[a + 1])
                  for a in range(2, N_LANES, 2)]
        out = jax.lax.sort((k_tile, k_depth, k_flag, pay[0], pay[1],
                            *packed), num_keys=3, is_stable=False)
        lanes = list(out[3:5])
        for p in out[5:]:
            a, b = unpack_f16_lane(p)
            lanes += [a, b]
    else:
        out = jax.lax.sort((k_tile, k_depth, k_flag, *pay),
                           num_keys=3, is_stable=False)
        lanes = list(out[3:])

    cap = p_stat + p_d
    starts_m = jnp.minimum(off, cap).astype(jnp.int32)
    ends_m = jnp.minimum(off + length, cap).astype(jnp.int32)
    n_stat_drop = jnp.maximum(total_s - p_stat, 0)
    return lanes, starts_m, ends_m, total, n_stat_drop


def _merge_one_env(static: StaticRaster, pre: dict, n_dyn: int,
                   config: RasterConfig, t_budget: int, p_stat: int):
    """Per-env merge of the dynamic pairs into the static stream.

    Returns (mix_lanes [10 x (p_stat + P_d,)], dirty_ids (t_budget,),
    starts/ends (t_budget,), telemetry (4,) i32 =
    [n_dirty, dropped_tiles, static_fill_dropped, binning_dropped])."""
    ntx, nty = static.n_tiles_x, static.n_tiles_y
    n_tiles = ntx * nty
    max_pairs_d = (config.max_pairs_override
                   or int(config.max_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR

    # dyn binning may pack payloads; the merge sort keys on EXACT depths
    # (packed binning quantizes the depth VALUE lane, so the exact depth
    # rides the binning sort as an extra payload lane — keying the merge
    # on the quantized lane flipped near-coplanar dyn/static pairs the
    # full pipeline never flips: 3.6e-2 rgb error on chip, round 5)
    pack = config.pack_payloads
    bins = bin_gaussians(pre, ntx, nty, TILE_W, TILE_H, max_pairs_d,
                         config.max_tiles_per_gaussian,
                         small_tiles=config.small_tiles,
                         max_large=config.max_large,
                         pack_payloads=pack,
                         mid_tiles=config.mid_tiles,
                         max_mid=config.max_mid,
                         extra_lanes=([pre["depth"].astype(jnp.float32)]
                                      if pack else None))

    # --- dirty tiles, compacted ascending ---------------------------------
    cnt_d = bins["tile_ends"] - bins["tile_starts"]          # (n_tiles,)
    dirty = cnt_d > 0
    n_dirty = jnp.sum(dirty.astype(jnp.int32))
    keys = jnp.where(dirty, jnp.arange(n_tiles, dtype=jnp.int32),
                     jnp.int32(n_tiles))
    dirty_ids = jax.lax.sort(keys)[:t_budget]
    real = dirty_ids < n_tiles
    # per-pair in-budget gate straight from the tile-sorted stream: the
    # k-th DISTINCT tile id in the stream is dirty rank k (every dirty
    # tile holds >= 1 pair, sentinels sort last), so a segment-boundary
    # cumsum replaces the per-pair dirty-rank gather
    pt = bins["pair_tile"]
    is_real = pt < n_tiles
    new_seg = jnp.concatenate([is_real[:1],
                               (pt[1:] != pt[:-1]) & is_real[1:]])
    rank_p = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    gate_d = is_real & (rank_p < t_budget)

    lanes, starts_m, ends_m, total, n_stat_drop = _merge_core(
        static, n_tiles, cnt_d, bins["pair_tile"], bins["pair_lanes"],
        dirty_ids, real, gate_d, p_stat,
        pack_sort=pack,
        depth_d_key=bins["extra_sorted"][0] if pack else None)
    over_tiles = jnp.maximum(n_dirty - t_budget, 0)
    tele = jnp.stack([n_dirty, over_tiles, n_stat_drop,
                      bins["n_large_dropped"]]).astype(jnp.int32)
    return lanes, dirty_ids, starts_m, ends_m, tele


def pack_lanes_wide(lanes) -> jax.Array:
    """10 merged lane arrays (P,) -> (P/8, 128) pair-major packed rows
    (lane = ATTR*j + a, the wide kernel's layout) via one transposing
    lax.reshape — no (P, 16) intermediate (attr-minor layouts tile 16
    lanes into 128 under vmap: 8x padded HBM)."""
    p = lanes[0].shape[0]
    assert p % GPR == 0
    lanes16 = list(lanes) + [jnp.zeros_like(lanes[0])] * (ATTR - len(lanes))
    a = jnp.stack(lanes16, axis=0).reshape(ATTR, p // GPR, GPR)
    return jax.lax.reshape(a, (p // GPR, GPR * ATTR), dimensions=(1, 2, 0))


def _render_incremental_stream(cam_static_w2c: list, dyn_scenes: dict,
                               sh_degree: int, config: RasterConfig,
                               t_budget: int = 96, p_mix: int = 0,
                               bg=(0.0, 0.0, 0.0)):
    """Stream-merge incremental render: bin ONLY the dynamic gaussians,
    then two-pointer-merge each dirty tile's static and dynamic segments
    INSIDE the sparse compositor (tile_kernel.rasterize_tiles_sparse_merge)
    — no fill compaction, no merge sort, no materialized merged table,
    and no static-fill budget to saturate (``p_mix`` is ignored).
    Pixel contract identical to the sort path: bitwise vs the full
    pipeline when payloads are unpacked; the telemetry's static-fill
    lane is constantly 0 (nothing to drop)."""
    cam0, st0, _ = cam_static_w2c[0]
    h, w = cam0.height, cam0.width
    ntx, nty = st0.n_tiles_x, st0.n_tiles_y
    n_tiles = ntx * nty
    B = dyn_scenes["means3D"].shape[0]
    n_dyn = dyn_scenes["means3D"].shape[1]
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))
    max_pairs_d = (config.max_pairs_override
                   or int(config.max_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR

    n_inst_all = B * len(cam_static_w2c)
    per_inst = max_pairs_d * (ATTR * 4 + 4)     # packed rows + depth plane
    chunk_b = max(1, (int(config.merge_mem_budget) // max(per_inst, 1))
                  // len(cam_static_w2c))
    if chunk_b < B:
        return chunked_incremental(_render_incremental_stream,
                                   cam_static_w2c, dyn_scenes, sh_degree,
                                   config, t_budget, p_mix, bg, chunk_b)

    shs = dyn_scenes["shs"] if sh_degree > 0 else dyn_scenes["shs"][:, :, :1]
    pack = config.pack_payloads

    # frozen static tables of all cameras, concatenated once
    data_s = jnp.concatenate(
        [st.data_pairs.reshape(-1, GPR * ATTR) for _, st, _ in
         cam_static_w2c], axis=0)
    dep_s = jnp.concatenate(
        [st.pair_depth.reshape(-1, GPR) for _, st, _ in cam_static_w2c],
        axis=0)
    cam_off = np.cumsum(
        [0] + [st.data_pairs.shape[0] for _, st, _ in cam_static_w2c])

    datas_d, deps_d, dids, s_st_l, s_en_l, d_st_l, d_en_l, teles = \
        [], [], [], [], [], [], [], []
    for ci, (cam, static, w2c) in enumerate(cam_static_w2c):
        assert (cam.height, cam.width) == (h, w)

        def one(means, scales, quats, opac, sh, _cam=cam, _st=static,
                _off=int(cam_off[ci]),
                _w2c=jnp.asarray(w2c, jnp.float32)):
            pre = preprocess_gaussians(_cam, _w2c, means, scales, quats,
                                       opac, sh, sh_degree)
            bins = bin_gaussians(
                pre, ntx, nty, TILE_W, TILE_H, max_pairs_d,
                config.max_tiles_per_gaussian,
                small_tiles=config.small_tiles,
                max_large=config.max_large, pack_payloads=pack,
                mid_tiles=config.mid_tiles, max_mid=config.max_mid,
                extra_lanes=([pre["depth"].astype(jnp.float32)]
                             if pack else None))
            cnt_d = bins["tile_ends"] - bins["tile_starts"]
            dirty = cnt_d > 0
            n_dirty = jnp.sum(dirty.astype(jnp.int32))
            keys = jnp.where(dirty, jnp.arange(n_tiles, dtype=jnp.int32),
                             jnp.int32(n_tiles))
            dirty_ids = jax.lax.sort(keys)[:t_budget]
            real = dirty_ids < n_tiles
            t_safe = jnp.minimum(dirty_ids, n_tiles - 1)
            zero = jnp.zeros_like(t_safe)
            d_st = jnp.where(real, bins["tile_starts"][t_safe], zero)
            d_en = jnp.where(real, bins["tile_ends"][t_safe], zero)
            s_st = jnp.where(real, _st.starts[t_safe] + _off, zero)
            s_en = jnp.where(real, _st.ends[t_safe] + _off, zero)
            # exact f32 view depth per pair for the in-kernel merge
            # compare (the packed value lane is f16-quantized — see
            # _merge_one_env's depth_d_key note)
            exact = (bins["extra_sorted"][0] if pack
                     else bins["pair_lanes"][DEPTH_LANE])
            exact = jnp.where(bins["pair_tile"] < n_tiles, exact, jnp.inf)
            over = jnp.maximum(n_dirty - t_budget, 0)
            tele = jnp.stack([n_dirty, over, jnp.int32(0),
                              bins["n_large_dropped"]]).astype(jnp.int32)
            return (pack_lanes_wide(bins["pair_lanes"]),
                    exact.reshape(-1, GPR),
                    dirty_ids, s_st, s_en, d_st, d_en, tele)

        out = jax.vmap(one)(
            dyn_scenes["means3D"], dyn_scenes["scales"],
            dyn_scenes["rotations"], dyn_scenes["opacities"], shs)
        datas_d.append(out[0])
        deps_d.append(out[1])
        dids.append(out[2])
        s_st_l.append(out[3])
        s_en_l.append(out[4])
        d_st_l.append(out[5])
        d_en_l.append(out[6])
        teles.append(out[7])

    data_d = jnp.concatenate(datas_d, axis=0)     # (I, P_d/8, 128)
    dep_d = jnp.concatenate(deps_d, axis=0)       # (I, P_d/8, 8)
    n_inst = data_d.shape[0]
    inst_off = (jnp.arange(n_inst, dtype=jnp.int32) * max_pairs_d)[:, None]
    d_starts = jnp.concatenate(d_st_l, axis=0) + inst_off
    d_ends = jnp.concatenate(d_en_l, axis=0) + inst_off
    s_starts = jnp.concatenate(s_st_l, axis=0)
    s_ends = jnp.concatenate(s_en_l, axis=0)
    dirty_ids = jnp.concatenate(dids, axis=0)

    caches_rgb = jnp.concatenate(
        [jnp.broadcast_to(st.rgb_cache[None], (B,) + st.rgb_cache.shape)
         for _, st, _ in cam_static_w2c], axis=0)
    caches_dep = jnp.concatenate(
        [jnp.broadcast_to(st.depth_cache[None], (B,) + st.depth_cache.shape)
         for _, st, _ in cam_static_w2c], axis=0)

    rgb, depth = rasterize_tiles_sparse_merge(
        data_s, dep_s, data_d.reshape(-1, GPR * ATTR),
        dep_d.reshape(-1, GPR), dirty_ids, s_starts, s_ends, d_starts,
        d_ends, caches_rgb, caches_dep, ntx, nty, chunk=config.chunk,
        bg=bg, interpret=config.interpret)

    n_cams = len(cam_static_w2c)
    rgb = jnp.clip(rgb[:, :, :h, :w], 0.0, 1.0).reshape(n_cams, B, 3, h, w)
    depth = depth[:, :h, :w].reshape(n_cams, B, h, w)
    tele = jnp.stack(teles, axis=0)
    return rgb, depth, tele


def render_incremental(cam_static_w2c: list, dyn_scenes: dict,
                       sh_degree: int, config: RasterConfig,
                       t_budget: int = 96, p_mix: int = 32768,
                       bg=(0.0, 0.0, 0.0)):
    """Render B envs x n fixed cameras incrementally.

    Args:
      cam_static_w2c: list of (Camera, StaticRaster, w2c (4,4)) per fixed
        camera (all same resolution).
      dyn_scenes: dict of stacked (B, N_dyn, ...) DYNAMIC gaussians only.
      p_mix: static-fill capacity per instance (the dynamic pairs always
        fit — their binning buffer bounds and reports them).
    Returns:
      (rgb (n_cams, B, 3, h, w) clipped, depth (n_cams, B, h, w),
       telemetry (n_cams, B, 4) i32 [n_dirty, dropped_tiles,
       static_fill_dropped, binning_dropped])
    """
    assert cam_static_w2c
    if config.merge_kernel == "stream":
        return _render_incremental_stream(cam_static_w2c, dyn_scenes,
                                          sh_degree, config, t_budget,
                                          p_mix, bg)
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
    max_pairs_d = (config.max_pairs_override
                   or int(config.max_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR
    cap = p_mix + max_pairs_d                     # merged rows per instance

    mixes, dids, starts, ends, teles, caches_rgb, caches_dep = \
        [], [], [], [], [], [], []
    for cam, static, w2c in cam_static_w2c:
        assert (cam.height, cam.width) == (h, w)

        def one(means, scales, quats, opac, sh, _cam=cam, _st=static,
                _w2c=jnp.asarray(w2c, jnp.float32)):
            pre = preprocess_gaussians(_cam, _w2c, means, scales, quats,
                                       opac, sh, sh_degree)
            lanes, d, s, e, t = _merge_one_env(_st, pre, n_dyn, config,
                                               t_budget, p_mix)
            return pack_lanes_wide(lanes), d, s, e, t

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

    mix = jnp.concatenate(mixes, axis=0)          # (I, cap/8, 128)
    n_inst = mix.shape[0]
    data = mix.reshape(-1, GPR * ATTR)
    inst_off = (jnp.arange(n_inst, dtype=jnp.int32) * cap)[:, None]
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
