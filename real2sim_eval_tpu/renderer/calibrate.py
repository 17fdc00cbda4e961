"""Init-time render budget calibration.

Every buffer in the raster pipeline is static-shaped (XLA requirement),
so budgets must be fixed before the first compile. Hand-tuned factors
(pairs = 3N, 4096 large-rect grants) silently under-render scenes that
don't look like the scene they were tuned on: a close wrist camera puts
20-30%% of gaussians past the dense slot block, and a dense scan
multiplies per-tile static segments in the incremental merge. The
reference never faces this — CUDA's duplicateWithKeys allocates the
exact pair buffer per frame on device (rasterizer_impl.cu:70-138) —
but a TPU-native design can get the same honesty a different way:
MEASURE the demand on the initial state at evaluator build time (one
cheap preprocess + rect-count pass per camera, vmapped over envs) and
size every budget from measured demand x margin. Margins absorb
in-episode motion; the drop telemetry lanes (surfaced per step in
production) remain the loud backstop if an episode outgrows them.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .preprocess import preprocess_gaussians, tile_rect

# margin over measured init demand; in-episode motion changes pair counts
# by O(10%) on the bench scenes (the wrist camera is the most volatile)
PAIR_MARGIN = 1.5
GRANT_MARGIN = 1.4
MIX_MARGIN = 1.8
TILE_MARGIN = 1.5

# candidate tier thresholds for the slot-count optimization (plan_tiers):
# exceed[i] = max over envs/cams of #gaussians whose clamped rect covers
# more than TIER_CAND[i] tiles
TIER_CAND = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)
# amortized per-grant-row overhead in slot units (the grant tiers gather
# their attr/payload rows before emission; a dense-block slot does not)
GRANT_ROW_COST = 8


@dataclasses.dataclass(frozen=True)
class DemandStats:
    """Measured binning demand for one camera family (max over envs/cams)."""

    pairs: int        # rect pairs after the D clamp
    n_gt_small: int   # gaussians needing slots beyond the dense block
    n_gt_mid: int     # gaussians needing slots beyond the mid tier
    n_gt_cap: int     # gaussians whose rect exceeds the D cap
    max_rect: int     # largest single-gaussian rect (tiles)
    exceed: tuple = ()  # #gaussians with clamped rect > t, per TIER_CAND t


def _demand_one(cam: Camera, w2c, means, scales, quats, opac, shs,
                sh_degree: int, tile_w: int, tile_h: int,
                small: int, mid: int, cap: int, ntx_round: int = 1):
    pre = preprocess_gaussians(cam, w2c, means, scales, quats, opac, shs,
                               sh_degree)
    # ntx_round: the FINE grid pads x to whole supertiles (8 fine columns
    # per 128-px supertile), so rects near the right image edge clamp at
    # the PADDED grid in binning_fine — demand must count on that grid or
    # edge-heavy scenes under-measure and the margins erode silently
    ntx = _round_up(-(-cam.width // tile_w), ntx_round)
    nty = -(-cam.height // tile_h)
    x0, y0, x1, y1 = tile_rect(pre["xy"], pre["radius"], ntx, nty,
                               tile_w, tile_h)
    counts = jnp.where(pre["valid"], (x1 - x0) * (y1 - y0), 0)
    counts_c = jnp.minimum(counts, cap)
    return (jnp.sum(counts_c),
            jnp.sum((counts > small).astype(jnp.int32)),
            jnp.sum((counts > mid).astype(jnp.int32)),
            jnp.sum((counts > cap).astype(jnp.int32)),
            jnp.max(counts),
            *[jnp.sum((counts > t).astype(jnp.int32))
              for t in TIER_CAND])


def measure_demand(cam_w2c_list, scenes: dict, sh_degree: int,
                   tile_w: int, tile_h: int, small: int, mid: int,
                   cap: int, ntx_round: int = 1) -> DemandStats:
    """Max demand over (cameras x envs).

    cam_w2c_list: list of (Camera, w2c (B, 4, 4)).
    scenes: stacked (B, N, ...) gaussian dict.
    """
    shs = scenes["shs"] if sh_degree > 0 else scenes["shs"][:, :, :1]
    fn = functools.partial(_demand_one, sh_degree=sh_degree,
                           tile_w=tile_w, tile_h=tile_h,
                           small=small, mid=mid, cap=cap,
                           ntx_round=ntx_round)
    agg = None
    for cam, w2c_b in cam_w2c_list:
        outs = jax.jit(jax.vmap(
            lambda w, m, s, q, o, h, _cam=cam: fn(_cam, w, m, s, q, o, h)
        ))(jnp.asarray(w2c_b, jnp.float32), scenes["means3D"],
           scenes["scales"], scenes["rotations"], scenes["opacities"], shs)
        outs = [int(jax.device_get(jnp.max(v))) for v in outs]
        agg = outs if agg is None else [max(a, b)
                                        for a, b in zip(agg, outs)]
    return DemandStats(pairs=agg[0], n_gt_small=agg[1], n_gt_mid=agg[2],
                       n_gt_cap=agg[3], max_rect=agg[4],
                       exceed=tuple(agg[5:]))


def _round_up(v: int, q: int) -> int:
    return -(-int(v) // q) * q


def _grant_count(exceeding: int, n: int, quantum: int) -> int:
    return min(_round_up(exceeding * GRANT_MARGIN + quantum, quantum), n)


def plan_tiers(demand: DemandStats, n: int, cap: int,
               small_floor: int = 1):
    """Pick (small, mid, max_mid, max_large) minimizing emitted slots.

    The binning sort/emit input is ``n*small + max_mid*(mid-small) +
    max_large*(cap-mid)`` slots (binning.py three-tier emission), and the
    demand histogram (``exceed``) says exactly how many gaussians each
    candidate threshold would push into the grant tiers — so the tier
    split is a tiny discrete optimization, not a hand-tuned constant.
    Grant rows also pay a gather before emission (GRANT_ROW_COST).
    Returns tiers that cover init demand exactly (drops only if the scene
    outgrows the margins — loud through n_large_dropped).
    """
    if not demand.exceed:
        return 4, 8, _grant_count(demand.n_gt_small, n, 256), \
            _grant_count(demand.n_gt_mid, n, 128)
    # small_floor: some consumers clamp the dense block from below (the
    # static-raster builds use >= 8 since build cost is one-time); the
    # planner must optimize within the consumer's actual domain
    cand = [t for t in TIER_CAND if small_floor <= t < cap]
    if not cand:
        cand = [t for t in TIER_CAND if t < cap][-1:]
    best = None
    for i, s in enumerate(cand):
        k_s = _grant_count(demand.exceed[TIER_CAND.index(s)], n, 256)
        # two-tier: [s, cap) continuation for the top k_s rects
        cost2 = n * s + k_s * ((cap - s) + GRANT_ROW_COST)
        if best is None or cost2 < best[0]:
            best = (cost2, s, 0, 0, k_s)
        for m in cand[i + 1:]:
            k_l = _grant_count(demand.exceed[TIER_CAND.index(m)], n, 128)
            cost3 = (n * s + k_s * ((m - s) + GRANT_ROW_COST)
                     + k_l * ((cap - m) + GRANT_ROW_COST))
            if cost3 < best[0]:
                best = (cost3, s, m, k_s, k_l)
    _, s, m, k_m, k_l = best
    if m == 0:
        # two-tier: binning treats (mid_tiles=0) as dense + one grant
        return s, 0, 0, k_l
    return s, m, k_m, k_l


def plan_config(config, demand: DemandStats, n: int, chunk_align: int,
                small: int, mid: int, cap: int, small_floor: int = 1):
    """Budget-calibrated copy of ``config`` for one full-pipeline family.

    Sets the pair buffer, the slot tiers (optimized from the demand
    histogram when available, else the passed small/mid), and the rect
    cap from measured demand (margins above). ``max_pairs_override``
    takes precedence over ``max_pairs_factor`` in the consumers.
    """
    # rect cap: cover the largest observed rect (with margin headroom) so
    # a close-up splat never gets a hole punched in it; drops stay loud
    # through n_large_dropped either way
    cap_eff = cap if demand.max_rect <= cap else min(
        _round_up(demand.max_rect * 1.3, 16), 512)
    # demand.pairs was clamped at the ORIGINAL cap; when the cap is
    # raised, granted big splats emit up to cap_eff tiles each — bound
    # the extra so the pair buffer covers the config actually planned
    pairs = demand.pairs + demand.n_gt_cap * max(cap_eff - cap, 0)
    max_pairs = _round_up(max(pairs * PAIR_MARGIN, 64), chunk_align)
    if demand.exceed:
        small, mid, max_mid, max_large = plan_tiers(demand, n, cap_eff,
                                                    small_floor)
    else:
        max_mid = _grant_count(demand.n_gt_small, n, 256)
        max_large = _grant_count(demand.n_gt_mid, n, 128)
    return dataclasses.replace(
        config,
        max_pairs_override=max_pairs,
        small_tiles=small,
        mid_tiles=mid,
        max_mid=max_mid,
        max_tiles_per_gaussian=cap_eff,
        max_large=max_large,
    )


def plan_config_fine(config, demand: DemandStats, n: int,
                     small_floor: int = 1):
    """Budget-calibrated copy of ``config`` for the FINE-kernel pipeline.

    Fine binning (binning_fine.py) is two-tier (dense block + one big-rect
    grant) with a centered-rect clamp, so the knobs are the fine pair
    buffer, the grant count, and the fine rect cap. Demand must be
    measured with the fine tile dims (16x8) on the supertile-PADDED x
    grid (measure_demand ntx_round=8) and the fine small/cap knobs.
    """
    from .fine_kernel import GPR

    # the emit block for the granted tier is (cap - small, k_large) wide,
    # so the cap stays bounded; overflow is loud through n_large_dropped
    cap = config.fine_max_tiles
    cap_eff = cap if demand.max_rect <= cap else min(
        _round_up(demand.max_rect * 1.3, 16), 1024)
    # see plan_config: demand.pairs was clamped at the original cap
    pairs = demand.pairs + demand.n_gt_cap * max(cap_eff - cap, 0)
    max_pairs = _round_up(max(pairs * PAIR_MARGIN, 64), GPR)
    small = config.fine_small_tiles
    max_large = _grant_count(demand.n_gt_small, n, 128)
    if demand.exceed:
        # fine binning is two-tier: optimize the dense-block size over the
        # demand histogram exactly like plan_tiers' two-tier candidates
        best = None
        for t in [t for t in TIER_CAND if small_floor <= t < cap_eff]:
            k_l = _grant_count(demand.exceed[TIER_CAND.index(t)], n, 128)
            cost = n * t + k_l * ((cap_eff - t) + GRANT_ROW_COST)
            if best is None or cost < best[0]:
                best = (cost, t, k_l)
        if best is not None:
            _, small, max_large = best
    return dataclasses.replace(
        config,
        fine_pairs_override=max_pairs,
        fine_small_tiles=small,
        max_large=max_large,
        fine_max_tiles=cap_eff,
    )


def measure_and_plan(config, cam_list, scenes: dict, sh_degree: int,
                     n: int, chunk_align: int,
                     wide_tiers=(4, 8, 16), small_floor: int = 1):
    """Demand measurement + budget planning for ONE camera family,
    dispatching on ``config.kernel`` — the single implementation the
    evaluator's wrist/mixed/dyn/static families and bench.calibrated_cfg
    all share (a fix applied here reaches every family)."""
    if config.kernel == "fine":
        from .binning_fine import FINE_H, FINE_W
        dem = measure_demand(cam_list, scenes, sh_degree, FINE_W, FINE_H,
                             config.fine_small_tiles,
                             config.fine_small_tiles,
                             config.fine_max_tiles, ntx_round=8)
        return plan_config_fine(config, dem, n, small_floor=small_floor)
    from .raster import TILE_H, TILE_W
    s, m, c = wide_tiers
    dem = measure_demand(cam_list, scenes, sh_degree, TILE_W, TILE_H,
                         s, m, c)
    return plan_config(config, dem, n, chunk_align, s, m, c,
                       small_floor=small_floor)


def plan_mix_budgets(static_rasters, dyn_demand_pairs: int,
                     n_dirty: int, mix_demand: int):
    """(t_budget, p_mix) for the incremental merge from measured demand.

    ``mix_demand`` is the STATIC-FILL demand (sum of truncated static
    segments over the dirty tiles) — since the sort-based merge, the
    dynamic pairs always fit (their binning buffer bounds them), so
    ``p_mix`` sizes only the static fill. ``dyn_demand_pairs`` is kept in
    the signature for callers that still report it but no longer raises
    the budget."""
    t_budget = _round_up(n_dirty * TILE_MARGIN + 8, 8)
    p_mix = _round_up(max(mix_demand, 64) * MIX_MARGIN, 512)
    del static_rasters, dyn_demand_pairs
    return int(t_budget), int(p_mix)
