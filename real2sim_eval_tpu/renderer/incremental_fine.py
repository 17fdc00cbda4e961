"""Fine-stream incremental (dirty-tile) rendering for fixed cameras.

Same exactness contract as the wide incremental path (incremental.py):
clean SUPERTILES keep their cached pixels; dirty supertiles are
re-composited from merged [dynamic; static] streams that reproduce the
full fine pipeline's sort order bitwise. The difference is the
compositor: instead of one (8,128)-pixel wide tile per pair-step (~10%
lane utilization at ~10 px splat footprints), each dirty supertile's 8
fine (8,16)-px streams walk in lockstep through the SAME fine kernel the
wrist camera uses (fine_kernel._kernel) — every vector op serves up to 8
pairs.

Grouping is by SUPERTILE (not by stream length as in the full-frame fine
path): a dirty supertile's 8 fine tiles form one launch whose (8,128)
output block overwrites the cached block in place (the same
BlockSpec-aliasing trick as tile_kernel.rasterize_tiles_sparse, junk pad
row for sentinels) — no scatter pass, no partial-block writes.

Dirtiness is per FINE tile (round 5): fine tiles of a dirty supertile
that received NO dynamic pairs get an EMPTY merged stream and the kernel
writes their lanes through from the cached block (read via the aliased
input block — already resident in VMEM) instead of re-walking their
static segment. At scan-scale dynamic objects this cuts the merged
static fill by the clean-lane fraction of each dirty supertile
(round 4 re-walked all 8 fine streams per dirty supertile). Exactness is
unchanged: a clean fine tile's cached pixels ARE its static-only
composite.

Reference semantics preserved: cuda_rasterizer/forward.cu:262-394 (via
fine_kernel.py's compositing loop).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning_fine import FINE_H, FINE_W, bin_gaussians_fine
from .camera import Camera
from .fine_kernel import (GPR, GROUPS, SEGR, SUP_H, SUP_W, _kernel,
                          pack_attr_major)
from .incremental import DEPTH_LANE, _merge_core, _static_cutoff
from .preprocess import preprocess_gaussians
from .raster import RasterConfig
from .tile_kernel import ATTR

# the kernel's supertile dims and the binner's fine-tile dims must agree
# (one launch = GROUPS fine streams covering one (SUP_H, SUP_W) block)
assert SUP_W == GROUPS * FINE_W and SUP_H == FINE_H


def _lanes_to_attr_rows(lanes) -> jax.Array:
    """10 payload lane arrays (P,) -> (P, ATTR) zero-padded attr rows
    (the pair-major layout _merge_core mixes; pack_attr_major re-packs
    the mixed rows to the kernel's attr-major form)."""
    pads = [jnp.zeros_like(lanes[0])] * (ATTR - len(lanes))
    return jnp.stack(list(lanes) + pads, axis=-1)


@dataclasses.dataclass(frozen=True)
class StaticRasterFine:
    """Frozen static-scene fine raster state for ONE fixed camera."""

    data_pairs: jax.Array     # (P_s, ATTR) fine-tile-sorted attr rows
    pair_depth: jax.Array     # (P_s,) view depth per static pair
    pair_tile: jax.Array      # (P_s,) i32 fine-tile id (pad: n_fine)
    starts: jax.Array         # (n_fine,) pair range per FINE tile
    ends: jax.Array           # (n_fine,)
    rgb_cache: jax.Array      # (3, h_pad + SUP_H, w_pad) incl. junk row
    depth_cache: jax.Array    # (h_pad + SUP_H, w_pad)
    n_super_x: int
    n_super_y: int
    max_seg: int              # longest static per-FINE-tile segment
    height: int
    width: int


def build_static_raster_fine(cam: Camera, w2c, scene: dict, sh_degree: int,
                             config: RasterConfig, bg=(0.0, 0.0, 0.0)
                             ) -> StaticRasterFine:
    """Preprocess + fine-bin + composite the static gaussians once."""
    from .fine_kernel import rasterize_fine_batch

    n = scene["means3D"].shape[0]
    nsx = -(-cam.width // SUP_W)
    nsy = -(-cam.height // SUP_H)
    n_fine = nsx * GROUPS * nsy
    # one-time build: calibrated override when present, else a generous
    # factor (buffer size costs nothing per step here)
    max_pairs = (config.fine_pairs_override
                 or int(max(config.fine_pairs_factor, 8.0) * n))
    max_pairs = -(-max_pairs // GPR) * GPR
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))

    shs = scene["shs"] if sh_degree > 0 else scene["shs"][:, :1]
    pre = preprocess_gaussians(cam, jnp.asarray(w2c, jnp.float32),
                               scene["means3D"], scene["scales"],
                               scene["rotations"], scene["opacities"],
                               shs, sh_degree)
    # exactness contract: the merge's tie rule needs unquantized depths,
    # so this path never packs payloads (see incremental.py)
    bins = bin_gaussians_fine(pre, nsx, nsy, max_pairs,
                              small_tiles=max(config.fine_small_tiles, 8),
                              max_tiles_per_gaussian=config.fine_max_tiles,
                              max_large=config.max_large,
                              pack_payloads=False)
    # the static cache is served for the WHOLE episode: a cropped build
    # would silently corrupt every clean supertile, so drops fail loudly
    # here (one-time host sync; per-step paths report via telemetry)
    n_drop = int(jax.device_get(bins["n_large_dropped"]))
    if n_drop:
        raise ValueError(
            f"static fine raster build dropped {n_drop} pairs — raise "
            "fine_pairs_override/fine_max_tiles/max_large (calibrate the "
            "static family, renderer/calibrate.py)")
    lanes = bins["pair_lanes"]
    attrs = _lanes_to_attr_rows(lanes)                        # (P_s, ATTR)
    depth = jnp.where(bins["pair_tile"] < n_fine,
                      attrs[:, DEPTH_LANE], jnp.inf)
    data = pack_attr_major(list(lanes))
    rgb, dep = rasterize_fine_batch(
        data, bins["fine_starts"][None], bins["fine_ends"][None],
        nsx, nsy, bg=bg, interpret=config.interpret)
    max_seg = int(jax.device_get(
        jnp.max(bins["fine_ends"] - bins["fine_starts"])))
    # saturation truncation per FINE tile (pixel-exact, see incremental.py)
    k_sat = _static_cutoff(attrs, bins["fine_starts"], bins["fine_ends"],
                           nsx * GROUPS, nsy, max_seg,
                           tile_w=FINE_W, tile_h=FINE_H)
    ends_trunc = bins["fine_starts"] + k_sat
    max_seg = int(jax.device_get(jnp.max(k_sat)))
    pad = ((0, SUP_H), (0, 0))
    return StaticRasterFine(
        data_pairs=attrs, pair_depth=depth, pair_tile=bins["pair_tile"],
        starts=bins["fine_starts"], ends=ends_trunc,
        rgb_cache=jnp.pad(rgb[0], ((0, 0),) + pad),
        depth_cache=jnp.pad(dep[0], pad),
        n_super_x=nsx, n_super_y=nsy, max_seg=max_seg,
        height=cam.height, width=cam.width)


def _merge_one_env_fine(static: StaticRasterFine, pre: dict, n_dyn: int,
                        config: RasterConfig, s_budget: int, p_stat: int):
    """Per-env merge at fine granularity: launches are per dirty
    SUPERTILE (8 fine-stream slots each) but only its DIRTY fine tiles
    get merged streams — clean fine tiles keep start == end and the
    sparse kernel passes their cached lanes through. Returns (mix_lanes
    [10 x (p_stat + P_d,)], slot fine ids (s_budget*8,), starts/ends
    (s_budget*8,), telemetry (4,) i32 = [n_dirty_super,
    dropped_supertiles, static_fill_dropped, binning_dropped])."""
    nsx, nsy = static.n_super_x, static.n_super_y
    n_super = nsx * nsy
    n_fine = n_super * GROUPS
    max_pairs_d = (config.fine_pairs_override
                   or int(config.fine_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR

    # dyn binning may pack payloads; the merge sort keys on EXACT depths
    # riding binning's extra_lanes (the packed depth VALUE lane is f16 —
    # see incremental._merge_one_env)
    pack = config.pack_payloads
    bins = bin_gaussians_fine(pre, nsx, nsy, max_pairs_d,
                              small_tiles=config.fine_small_tiles,
                              max_tiles_per_gaussian=config.fine_max_tiles,
                              max_large=config.max_large,
                              pack_payloads=pack,
                              extra_lanes=([pre["depth"].astype(jnp.float32)]
                                           if pack else None))

    cnt_d = bins["fine_ends"] - bins["fine_starts"]           # (n_fine,)
    dirty_f = cnt_d > 0
    # fine id f = ty*n_fine_x + tx = (supertile id)*GROUPS + lane group
    # (n_fine_x = nsx*GROUPS), so consecutive groups of 8 fine ids ARE the
    # supertiles — reshape groups them exactly
    cnt_super = jnp.sum(cnt_d.reshape(n_super, GROUPS), axis=1)
    dirty_s = cnt_super > 0
    n_dirty = jnp.sum(dirty_s.astype(jnp.int32))
    keys = jnp.where(dirty_s, jnp.arange(n_super, dtype=jnp.int32),
                     jnp.int32(n_super))
    dirty_super = jax.lax.sort(keys)[:s_budget]               # ascending
    slot_tile = (dirty_super[:, None] * GROUPS
                 + jnp.arange(GROUPS, dtype=jnp.int32)[None]).reshape(-1)
    t_cl = jnp.minimum(slot_tile, n_fine - 1)
    # per-FINE-tile dirtiness: clean fine tiles of a dirty supertile do
    # NOT participate in the merge (empty slot -> kernel cache passthrough)
    real = (slot_tile < n_fine) & dirty_f[t_cl]
    # per-pair in-budget gate from the fine-tile-sorted stream: fine ids
    # ascend, so supertile ids (fine // GROUPS) ascend too and the k-th
    # DISTINCT supertile in the stream is dirty-supertile rank k (every
    # dirty supertile holds >= 1 pair, sentinels sort last). A pair's own
    # fine tile is dirty by construction, so supertile-rank < s_budget is
    # the whole gate (see _merge_core's gate_d contract).
    pt = bins["pair_tile"]
    sp = pt // GROUPS
    is_real = pt < n_fine
    new_seg = jnp.concatenate([is_real[:1],
                               (sp[1:] != sp[:-1]) & is_real[1:]])
    srank_p = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    gate_d = is_real & (srank_p < s_budget)

    lanes, starts_m, ends_m, total, n_stat_drop = _merge_core(
        static, n_fine, cnt_d, bins["pair_tile"], bins["pair_lanes"],
        slot_tile, real, gate_d, p_stat,
        pack_sort=pack,
        depth_d_key=bins["extra_sorted"][0] if pack else None)
    over_super = jnp.maximum(n_dirty - s_budget, 0)
    tele = jnp.stack([n_dirty, over_super, n_stat_drop,
                      bins["n_large_dropped"]]).astype(jnp.int32)
    return lanes, slot_tile, starts_m, ends_m, tele


def _kernel_sparse_fine(tids_ref, starts_ref, ends_ref, data_hbm,
                        rgb_in, depth_in, rgb_ref, depth_ref, *,
                        n_super_x: int, n_rows: int, bg):
    """fine_kernel._kernel writing through cache-aliased supertile blocks.

    rgb_in/depth_in are the cached frames the outputs alias; lanes of
    CLEAN fine tiles (empty merged stream) copy the cached block through
    — it is already resident in VMEM as the aliased input block, so the
    passthrough costs one select, not a DMA. Clean supertiles are never
    visited at all and keep their pixels through the alias."""
    _kernel(tids_ref, starts_ref, ends_ref, data_hbm, rgb_ref, depth_ref,
            n_super_x=n_super_x, n_rows=n_rows, bg=bg,
            rgb_in_ref=rgb_in, depth_in_ref=depth_in)


def rasterize_fine_sparse(data, slot_ids, starts, ends, rgb_cached,
                          depth_cached, n_super_x, n_super_y, bg,
                          interpret=False):
    """Re-composite ONLY the dirty supertiles on top of cached frames.

    Args:
      data: (rows, 128) attr-major packed mix table (all instances
        concatenated, 8 pairs per row).
      slot_ids: (I, S*8) i32 fine-tile ids, 8 consecutive per dirty
        supertile, ascending; sentinels >= n_fine land on the junk row.
      starts/ends: (I, S*8) GLOBAL pair offsets into data's pair space.
      rgb_cached / depth_cached: (I, 3, h_pad + SUP_H, w_pad) and
        (I, h_pad + SUP_H, w_pad) cached frames incl. the junk pad row;
        outputs alias them.
    Returns (rgb, depth) of the same padded shapes (caller crops).
    """
    n_inst, n_slots = slot_ids.shape
    assert n_slots % GROUPS == 0
    s_budget = n_slots // GROUPS
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))

    # SMEM budget: split the instance axis when the prefetch tables
    # outgrow it (same guard as rasterize_fine_batch — the bound covers
    # the SUM of the three slot/start/end arrays)
    from .fine_kernel import SMEM_PREFETCH_BUDGET
    max_inst = max(SMEM_PREFETCH_BUDGET // (3 * n_slots * 4), 1)
    if n_inst > max_inst:
        outs = [rasterize_fine_sparse(
            data, slot_ids[i:i + max_inst], starts[i:i + max_inst],
            ends[i:i + max_inst], rgb_cached[i:i + max_inst],
            depth_cached[i:i + max_inst], n_super_x, n_super_y, bg,
            interpret)
            for i in range(0, n_inst, max_inst)]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    data = jnp.pad(data, ((0, SEGR), (0, 0)))   # segment DMA over-read room
    n_rows = data.shape[0]
    h_pad = n_super_y * SUP_H
    w_pad = n_super_x * SUP_W
    assert rgb_cached.shape == (n_inst, 3, h_pad + SUP_H, w_pad)
    assert depth_cached.shape == (n_inst, h_pad + SUP_H, w_pad)

    def sid_of(g, t):
        # the 8 slots of program g share one supertile (or sentinel):
        # sentinel fine id == n_fine -> sid == n_super -> junk row
        # (n_super // n_super_x == n_super_y, n_super % n_super_x == 0)
        return t[g * GROUPS] // GROUPS

    rgb_spec = pl.BlockSpec(
        (1, 3, SUP_H, SUP_W),
        lambda g, t, s, e: (g // s_budget, 0,
                            sid_of(g, t) // n_super_x,
                            sid_of(g, t) % n_super_x))
    depth_spec = pl.BlockSpec(
        (1, SUP_H, SUP_W),
        lambda g, t, s, e: (g // s_budget,
                            sid_of(g, t) // n_super_x,
                            sid_of(g, t) % n_super_x))
    kernel = functools.partial(_kernel_sparse_fine, n_super_x=n_super_x,
                               n_rows=n_rows, bg=bg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_inst * s_budget,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), rgb_spec, depth_spec],
        out_specs=[rgb_spec, depth_spec],
    )
    rgb, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(rgb_cached.shape, jnp.float32),
            jax.ShapeDtypeStruct(depth_cached.shape, jnp.float32),
        ],
        # operand numbering includes the 3 scalar-prefetch args
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(slot_ids.reshape(-1), starts.reshape(-1), ends.reshape(-1), data,
      rgb_cached, depth_cached)
    return rgb, depth


def render_incremental_fine(cam_static_w2c: list, dyn_scenes: dict,
                            sh_degree: int, config: RasterConfig,
                            t_budget: int = 96, p_mix: int = 32768,
                            bg=(0.0, 0.0, 0.0)):
    """Render B envs x n fixed cameras incrementally with fine streams.

    Args mirror incremental.render_incremental (same keyword names so the
    evaluator/bench call sites dispatch on kernel kind alone);
    cam_static_w2c carries StaticRasterFine entries. ``t_budget`` counts
    dirty SUPERTILES per instance (each contributes 8 fine-stream slots).
    Returns (rgb (n_cams, B, 3, h, w), depth (n_cams, B, h, w),
    telemetry (n_cams, B, 4) i32 [n_dirty_super, dropped_supertiles,
    static_fill_dropped, binning_dropped]).
    """
    assert cam_static_w2c
    cam0, st0, _ = cam_static_w2c[0]
    h, w = cam0.height, cam0.width
    nsx, nsy = st0.n_super_x, st0.n_super_y
    B = dyn_scenes["means3D"].shape[0]
    n_dyn = dyn_scenes["means3D"].shape[1]
    p_mix = -(-p_mix // GPR) * GPR
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))
    # memory-bounded instance chunking (incremental.merge_chunk_size):
    # scan-scale dynamic objects make the per-instance merge tables tens
    # of MB — all cams x envs at once OOM'd a 16 GB v5e (round 4)
    from .incremental import chunked_incremental, merge_chunk_size
    n_inst_all = B * len(cam_static_w2c)
    chunk_b = max(1, merge_chunk_size(config, n_dyn, p_mix, n_inst_all,
                                      fine=True) // len(cam_static_w2c))
    if chunk_b < B:
        return chunked_incremental(render_incremental_fine, cam_static_w2c,
                                   dyn_scenes, sh_degree, config,
                                   t_budget, p_mix, bg, chunk_b)
    shs = dyn_scenes["shs"] if sh_degree > 0 else dyn_scenes["shs"][:, :, :1]
    max_pairs_d = (config.fine_pairs_override
                   or int(config.fine_pairs_factor * n_dyn))
    max_pairs_d = -(-max_pairs_d // GPR) * GPR
    cap = p_mix + max_pairs_d                     # merged rows per instance

    mixes, sids, starts, ends, teles, caches_rgb, caches_dep = \
        [], [], [], [], [], [], []
    for cam, static, w2c in cam_static_w2c:
        assert (cam.height, cam.width) == (h, w)

        def one(means, scales, quats, opac, sh, _cam=cam, _st=static,
                _w2c=jnp.asarray(w2c, jnp.float32)):
            pre = preprocess_gaussians(_cam, _w2c, means, scales, quats,
                                       opac, sh, sh_degree)
            lanes, d, s, e, t = _merge_one_env_fine(_st, pre, n_dyn,
                                                    config, t_budget, p_mix)
            return pack_attr_major(lanes), d, s, e, t

        m, d, s, e, t = jax.vmap(one)(
            dyn_scenes["means3D"], dyn_scenes["scales"],
            dyn_scenes["rotations"], dyn_scenes["opacities"], shs)
        mixes.append(m)
        sids.append(d)
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
    slot_ids = jnp.concatenate(sids, axis=0)

    rgb, depth = rasterize_fine_sparse(
        data, slot_ids, starts, ends,
        jnp.concatenate(caches_rgb, axis=0),
        jnp.concatenate(caches_dep, axis=0),
        nsx, nsy, bg=bg, interpret=config.interpret)

    n_cams = len(cam_static_w2c)
    rgb = jnp.clip(rgb[:, :, :h, :w], 0.0, 1.0).reshape(n_cams, B, 3, h, w)
    depth = depth[:, :h, :w].reshape(n_cams, B, h, w)
    tele = jnp.stack(teles, axis=0)
    return rgb, depth, tele
