"""Differential-free Gaussian-splat rasterization: forward RGB + median depth.

Two backends with identical semantics (checked against each other in tests):

  - ``reference``: dense O(N*H*W) jnp compositor — exact, used for tests
    and tiny scenes.
  - ``pallas``: tile-binned front-to-back compositor as a Pallas TPU kernel.
    Tiles are (8, 128) pixels — the native VPU register shape — instead of
    the CUDA kernel's 16x16 (forward.cu BLOCK_X/Y, config.h:15-16): on TPU
    any smaller block wastes lanes, and wider tiles reduce the duplicated
    pair count.

Compositing semantics match renderCUDA (forward.cu:262-394):
  - alpha = min(0.99, opacity * exp(power)), skip below 1/255
  - front-to-back accumulation, pixel freezes when T would drop below 1e-4
    (that contribution excluded, matching the CUDA ``done`` flag)
  - median depth: the first splat whose blend crosses T=0.5, else 15.0
    (forward.cu:309,369-373)
  - final color C + T * background (forward.cu:391)

The production compositors here are forward-only: the reference wraps
every runtime render in ``torch.no_grad`` (gs_renderer.py:923,952,1018).
Differentiable rendering (the capability backward.cu provides) lives in
``renderer/diff.py`` — a custom-VJP path with a Pallas backward kernel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .binning import bin_gaussians
from .camera import Camera
from .preprocess import preprocess_gaussians

MEDIAN_DEPTH_DEFAULT = 15.0
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99

TILE_H = 8
TILE_W = 128


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    backend: str = "auto"              # auto | pallas | reference
    # pair buffer = factor * N. Runtime paths use 3.0: measured bench-scene
    # streams peak at 2.7x N (static fixed cam) / 1.9x N (wrist); binning
    # reports drops (n_large_dropped) and the on-chip pixel checks diff
    # against the dense backend, so an undersized buffer is loud, and the
    # buffer size directly scales the per-step sort + gather cost.
    max_pairs_factor: float = 3.0
    max_tiles_per_gaussian: int = 16   # per-gaussian tile-rect clamp (D)
    chunk: int = 256                   # gaussians per DMA chunk in the kernel
    interpret: bool = False            # run the Pallas kernel interpreted
    # dense tile slots per gaussian: the emit-block size scales the sort
    # input, so the dense block stays small and bigger rects ride the
    # grant tiers below. Production paths CALIBRATE all of these from
    # measured demand at evaluator build (renderer/calibrate.py) — the
    # defaults only serve ad-hoc/rasterize() calls.
    small_tiles: int = 4
    max_large: int = 4096              # big-rect gaussians granted full rects
    # optional middle grant tier (binning.py three-tier emission): rects
    # in (small_tiles, mid_tiles] are far more common than full-cap rects,
    # so granting them a short continuation keeps the sort near demand
    mid_tiles: int = 0                 # 0 = two-tier emission
    max_mid: int = 0                   # gaussians granted the mid tier
    # exact pair-buffer size; 0 = derive from max_pairs_factor * N
    max_pairs_override: int = 0
    # measure per-camera demand at evaluator build and size every budget
    # (pair buffers, grant tiers, rect cap, dirty/mix budgets) from it
    auto_budgets: bool = True
    kernel: str = "wide"               # compositor: wide (8,128) | fine
    # per-family override: the wrist camera's full pipeline may prefer a
    # different compositor than the fixed cameras' incremental path
    # (chosen by on-chip A/B); "inherit" = use `kernel`
    wrist_kernel: str = "inherit"      # inherit | wide | fine
    # fine-kernel budgets: (8,16)-px tiles multiply per-gaussian rect cells
    # vs the wide kernel's (8,128) tiles, so the dense slot block and the
    # big-rect grant are separate knobs (drops are loud either way)
    fine_small_tiles: int = 6
    fine_max_tiles: int = 32
    fine_pairs_factor: float = 5.0     # fine pair buffer = factor * N
    # exact fine pair-buffer size; 0 = derive from fine_pairs_factor * N.
    # Set by calibrate.plan_config_fine from measured demand.
    fine_pairs_override: int = 0
    # f16-pack 8 of the 10 sort payload lanes (x/y stay f32): ~40% less
    # sort work for ~5e-4 relative attr quantization — well inside the
    # 1/255 rgb / 1e-2 depth pixel tolerance. Exactness tests disable it.
    pack_payloads: bool = True
    # incremental (dirty-tile) rendering of fixed cameras on a static scene
    # (renderer/incremental.py): "auto" enables it on TPU, "on" forces it
    # (e.g. interpret-mode tests), "off" always uses the full pipeline
    incremental: str = "auto"
    # block-level conservative frustum pre-cull of the STATIC scene for
    # moving (wrist) cameras (renderer/precull.py): exact preprocess +
    # binning + sort then scale with the visible count, not N — the
    # O(visible) binning property of the CUDA rasterizer
    # (rasterizer_impl.cu:70-111) at static shapes. "auto" enables it
    # whenever the incremental path calibrates and the static scene is
    # big enough to matter; pixel-exact vs the unculled pipeline
    # (tests/test_precull.py), overflow rides the wrist drop telemetry.
    wrist_precull: str = "auto"        # auto | on | off
    dirty_budget: int = 96             # re-composited tiles per instance
    # live merge-sort bytes per incremental compositor launch: instances
    # are chunked through merge+composite when (mp_d + p_mix) x 13 lanes
    # x 4 x 2 (+ the packed table) x instances exceeds this
    # (incremental.merge_chunk_size). The sort-based merge holds ~1/4 the
    # bytes of the round-4 materialized mix at the same scene, so 4 GB
    # runs the 130k-gaussian bench headline unchunked on a 16 GB v5e
    merge_mem_budget: int = 4 << 30
    # STATIC-FILL budget per instance of the incremental merge (the
    # dynamic pairs always fit — their binning buffer bounds them);
    # overflow is loud (telemetry lane 2)
    mix_pairs: int = 16384
    # incremental merge strategy (wide kernel): "sort" materializes the
    # merged pair table via one keyed lax.sort of [static fill; dynamic
    # pairs] (incremental._merge_core); "stream" merges the two
    # depth-sorted streams inside the sparse compositor kernel with two
    # pointers (tile_kernel._composite_merge_scoped) — no merged table,
    # no sort, no static-fill budget (mix_pairs unused), cost scales
    # with pairs actually composited instead of budgeted volume
    merge_kernel: str = "sort"         # sort | stream


def rasterize(cam: Camera, w2c, means3d, scales, quats, opacities, shs,
              sh_degree: int, bg=(0.0, 0.0, 0.0),
              config: RasterConfig = RasterConfig()):
    """Render one camera. Returns (rgb (3,H,W) in [0,1]-ish, depth (H,W)).

    ``bg`` must be a static python tuple/list (it is compiled into the
    kernel, matching the reference's per-call bg color)."""
    pre = preprocess_gaussians(cam, w2c, means3d, scales, quats, opacities,
                               shs, sh_degree)
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))
    backend = config.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend == "reference":
        # tile-rect gating granularity follows the configured compositor so
        # cross-backend tests are exact (gaussian tails beyond the 3-sigma
        # rect are a definitional cutoff of the rasterizer family; upstream
        # CUDA gates at 16x16, forward.cu:230-237 + config.h:15-16)
        if config.kernel == "fine":
            from .binning_fine import FINE_W
            bin_w = FINE_W
        else:
            bin_w = TILE_W
        return _composite_reference(cam, pre, jnp.asarray(bg, jnp.float32),
                                    bin_w=bin_w)
    if config.kernel == "fine":
        scenes = {"means3D": means3d[None], "scales": scales[None],
                  "rotations": quats[None], "opacities": opacities[None],
                  "shs": shs[None]}
        rgb, depth = rasterize_batch([(cam, jnp.asarray(w2c)[None])],
                                     scenes, sh_degree, bg, config)
        return rgb[0, 0], depth[0, 0]
    return _composite_pallas(cam, pre, bg, config)


def gather_pair_attrs(pre: dict, bins: dict, n: int) -> jax.Array:
    """Pair-level attribute table (P, ATTR) rows.

    Since binning v3 the sorted attr lanes ride the tile sort as payloads
    (binning.py step 3), so no per-pair gather is needed (~35 ns/row
    batched on TPU, 190 ms/step at 64 wrist instances in the v2 design).
    Row form is for the incremental merge's scatter/gather bookkeeping —
    ONLY materialize it at small P (the stacked (P, 16) table takes an
    attr-minor layout under vmap: 8x lane padding in HBM)."""
    del pre, n
    from .tile_kernel import ATTR

    lanes = bins["pair_lanes"]
    return jnp.pad(jnp.stack(lanes, axis=-1),
                   ((0, 0), (0, ATTR - len(lanes))))


def gather_pair_table(pre: dict, bins: dict, n: int) -> jax.Array:
    """Packed (P/8, 128) kernel pair table, lane = 16*j + a (pair-major).

    Built from the sorted lanes with ONE transposing lax.reshape —
    stacking rows first ((P, 16) f32) tiles 16 attr lanes into 128 under
    vmap (8x padded HBM: 9.2 GB / OOM at the 100k-gaussian bench)."""
    del pre, n
    from .tile_kernel import ATTR, GPR

    lanes = list(bins["pair_lanes"])
    p = lanes[0].shape[0]
    assert p % GPR == 0
    lanes += [jnp.zeros_like(lanes[0])] * (ATTR - len(lanes))
    a = jnp.stack(lanes, axis=0).reshape(ATTR, p // GPR, GPR)
    # read order (pair-row, j, attr) -> lane 16*j + a, no (.., 16)-minor
    # intermediate
    return jax.lax.reshape(a, (p // GPR, GPR * ATTR), dimensions=(1, 2, 0))


def rasterize_batch(cam_w2c_list, scenes, sh_degree: int, bg=(0.0, 0.0, 0.0),
                    config: RasterConfig = RasterConfig(),
                    return_drops: bool = False):
    """Render B environments x n_cams cameras in ONE compositor launch.

    The round-1 bottleneck was per-env serial rasterization
    (parallel/batched.py's lax.map); here preprocess + binning vmap over
    envs per camera, all pair tables concatenate into one chunk-aligned
    buffer, and a single Pallas grid covers (env, camera, tile)
    (VERDICT round-1, next-step 2).

    Args:
      cam_w2c_list: list over cameras of (Camera, w2c (B, 4, 4)); all
        cameras must share width/height (the reference renders all views at
        848x480, cfg/env/xarm_gripper.yaml:22-49).
      scenes: dict of stacked (B, N, ...) gaussian arrays (means3D, scales,
        rotations, opacities, shs).
      config: must resolve to the pallas backend (callers keep the dense
        reference path for tiny CPU tests).
    Returns:
      (rgb (n_cams, B, 3, H, W) clipped, depth (n_cams, B, H, W)); with
      ``return_drops`` also an (n_cams, B) i32 of binning drop counts
      (rect-clamp + pair-budget overflow per instance) — runtime paths
      surface these as render telemetry so an undersized
      ``max_pairs_factor`` is loud in production, not just under
      ``bench.py --check``.
    """
    assert cam_w2c_list, "need at least one camera"
    cam0 = cam_w2c_list[0][0]
    h, w = cam0.height, cam0.width
    for cam, _ in cam_w2c_list:
        assert (cam.height, cam.width) == (h, w), \
            "batched render needs uniform camera resolution"
    B = scenes["means3D"].shape[0]
    n = scenes["means3D"].shape[1]
    n_sup_x = -(-w // TILE_W)
    n_sup_y = -(-h // TILE_H)
    if config.kernel == "fine":
        return _rasterize_batch_fine(cam_w2c_list, scenes, sh_degree, bg,
                                     config, n_sup_x, n_sup_y,
                                     return_drops=return_drops)
    bin_w = TILE_W
    n_bin_x = n_sup_x
    max_tiles = config.max_tiles_per_gaussian
    max_pairs = (config.max_pairs_override
                 or int(config.max_pairs_factor * n))
    max_pairs = -(-max_pairs // config.chunk) * config.chunk
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))

    shs = scenes["shs"] if sh_degree > 0 else scenes["shs"][:, :, :1]

    def one(cam):
        def per_env(w2c, means, scales, quats, opac, sh):
            pre = preprocess_gaussians(cam, w2c, means, scales, quats, opac,
                                       sh, sh_degree)
            bins = bin_gaussians(pre, n_bin_x, n_sup_y, bin_w, TILE_H,
                                 max_pairs, max_tiles,
                                 small_tiles=config.small_tiles,
                                 max_large=config.max_large,
                                 pack_payloads=config.pack_payloads,
                                 mid_tiles=config.mid_tiles,
                                 max_mid=config.max_mid)
            data = gather_pair_table(pre, bins, n)
            return (data, bins["tile_starts"], bins["tile_ends"],
                    bins["n_large_dropped"])
        return per_env

    datas, starts, ends, drops = [], [], [], []
    for cam, w2c_b in cam_w2c_list:
        d, s, e, dr = jax.vmap(one(cam))(
            jnp.asarray(w2c_b, jnp.float32), scenes["means3D"],
            scenes["scales"], scenes["rotations"], scenes["opacities"], shs)
        datas.append(d)
        starts.append(s)
        ends.append(e)
        drops.append(dr)
    data = jnp.concatenate(datas, axis=0)        # (I, n_rows, 128)
    n_rows = data.shape[1]
    data = data.reshape(-1, data.shape[-1])
    starts = jnp.concatenate(starts, axis=0)     # (I, n_tiles)
    ends = jnp.concatenate(ends, axis=0)
    inst_off = (jnp.arange(starts.shape[0], dtype=jnp.int32)
                * (n_rows * 8))[:, None]         # pairs per instance segment
    starts = starts + inst_off
    ends = ends + inst_off

    from .tile_kernel import rasterize_tiles_batch
    rgb, depth = rasterize_tiles_batch(
        data, starts, ends, n_sup_x, n_sup_y, chunk=config.chunk,
        bg=bg, interpret=config.interpret)
    n_cams = len(cam_w2c_list)
    rgb = jnp.clip(rgb[:, :, :h, :w], 0.0, 1.0).reshape(
        n_cams, B, 3, h, w)
    depth = depth[:, :h, :w].reshape(n_cams, B, h, w)
    if return_drops:
        return rgb, depth, jnp.stack(drops, axis=0).astype(jnp.int32)
    return rgb, depth


def _rasterize_batch_fine(cam_w2c_list, scenes, sh_degree, bg, config,
                          n_sup_x, n_sup_y, return_drops=False):
    """Batched fine-tile pipeline: vmapped preprocess + analytic-bound
    binning, attr-major packed tables, ONE fine compositor grid over
    (instance, supertile). See binning_fine.py / fine_kernel.py."""
    from .binning_fine import bin_gaussians_fine
    from .fine_kernel import GPR, pack_attr_major, rasterize_fine_batch

    cam0 = cam_w2c_list[0][0]
    h, w = cam0.height, cam0.width
    B = scenes["means3D"].shape[0]
    n = scenes["means3D"].shape[1]
    bg = tuple(float(b) for b in np.asarray(bg).reshape(-1))
    max_pairs = (config.fine_pairs_override
                 or int(config.fine_pairs_factor * n))
    max_pairs = -(-max_pairs // GPR) * GPR
    shs = scenes["shs"] if sh_degree > 0 else scenes["shs"][:, :, :1]

    def one(cam):
        def per_env(w2c, means, scales, quats, opac, sh):
            pre = preprocess_gaussians(cam, w2c, means, scales, quats, opac,
                                       sh, sh_degree)
            bins = bin_gaussians_fine(
                pre, n_sup_x, n_sup_y, max_pairs,
                small_tiles=config.fine_small_tiles,
                max_tiles_per_gaussian=config.fine_max_tiles,
                max_large=config.max_large,
                pack_payloads=config.pack_payloads)
            data = pack_attr_major(bins["pair_lanes"])
            return (data, bins["fine_starts"], bins["fine_ends"],
                    bins["n_large_dropped"])
        return per_env

    # memory-bounded env chunking (merge_mem_budget, same contract as
    # incremental.merge_chunk_size): each instance holds its packed
    # attr-major table (ATTR*4 B/pair) plus the binning sort transient
    # (~14 lanes f32, double-buffered) live at once — at wrist-fine
    # headline scale (~1M pairs x 64 envs) the unchunked table alone is
    # several GB and OOM'd a 16 GB v5e (round-5 chip session). lax.map
    # serializes chunk tables while each chunk still fills the chip.
    from .fine_kernel import ATTR as FATTR
    per_inst = max_pairs * (FATTR * 4 + 14 * 4 * 2)
    chunk_b = max(1, min(B, int(config.merge_mem_budget)
                         // (max(per_inst, 1) * max(len(cam_w2c_list), 1))))

    def run_cam(cam, w2c_b, scn):
        """Full pipeline for ONE camera over (Bc, ...) scenes; returns
        (rgb (Bc,3,Hp,Wp), depth (Bc,Hp,Wp), drops (Bc,))."""
        d, s, e, dr = jax.vmap(one(cam))(
            jnp.asarray(w2c_b, jnp.float32), scn["means3D"], scn["scales"],
            scn["rotations"], scn["opacities"], scn["shs"])
        n_rows = d.shape[1]
        data = d.reshape(-1, d.shape[-1])
        off = (jnp.arange(d.shape[0], dtype=jnp.int32)
               * (n_rows * GPR))[:, None]
        rgb_c, dep_c = rasterize_fine_batch(
            data, s + off, e + off, n_sup_x, n_sup_y,
            bg=bg, interpret=config.interpret)
        return rgb_c, dep_c, dr

    scn_in = {"means3D": scenes["means3D"], "scales": scenes["scales"],
              "rotations": scenes["rotations"],
              "opacities": scenes["opacities"], "shs": shs}
    rgbs, deps, drops = [], [], []
    for cam, w2c_b in cam_w2c_list:
        if chunk_b >= B:
            r, dp, dr = run_cam(cam, w2c_b, scn_in)
        else:
            n_chunks = -(-B // chunk_b)
            Bp = n_chunks * chunk_b

            def pad(v):
                if Bp == B:
                    return v
                return jnp.concatenate(
                    [v, jnp.broadcast_to(v[:1], (Bp - B,) + v.shape[1:])],
                    axis=0)

            xs = {k: pad(v).reshape((n_chunks, chunk_b) + v.shape[1:])
                  for k, v in scn_in.items()}
            xs["w2c"] = pad(jnp.asarray(w2c_b, jnp.float32)).reshape(
                n_chunks, chunk_b, 4, 4)
            r, dp, dr = jax.lax.map(
                lambda c, _cam=cam: run_cam(_cam, c.pop("w2c"), c), xs)
            r = r.reshape((Bp,) + r.shape[2:])[:B]
            dp = dp.reshape((Bp,) + dp.shape[2:])[:B]
            dr = dr.reshape(-1)[:B]
        rgbs.append(r)
        deps.append(dp)
        drops.append(dr)

    rgb = jnp.clip(jnp.stack(rgbs)[:, :, :, :h, :w], 0.0, 1.0)
    depth = jnp.stack(deps)[:, :, :h, :w]
    n_cams = len(cam_w2c_list)
    assert rgb.shape == (n_cams, B, 3, h, w)
    if return_drops:
        return rgb, depth, jnp.stack(drops, axis=0).astype(jnp.int32)
    return rgb, depth


# ---------------------------------------------------------------------------
# reference (dense) backend
# ---------------------------------------------------------------------------


def _composite_reference(cam: Camera, pre: dict, bg: jax.Array,
                         bin_w: int = TILE_W, bin_h: int = TILE_H):
    from .preprocess import tile_rect

    h, w = cam.height, cam.width
    n_tiles_x = -(-w // bin_w)
    n_tiles_y = -(-h // bin_h)
    order = jnp.argsort(jnp.where(pre["valid"], pre["depth"], jnp.inf))
    xy = pre["xy"][order]
    conic = pre["conic"][order]
    opac = jnp.where(pre["valid"], pre["opacity"], 0.0)[order]
    rgb = pre["rgb"][order]
    depth = pre["depth"][order]
    x0, y0, x1, y1 = tile_rect(pre["xy"], pre["radius"],
                               n_tiles_x, n_tiles_y, bin_w, bin_h)
    x0, y0, x1, y1 = x0[order], y0[order], x1[order], y1[order]

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    tile_x = (jnp.arange(w) // bin_w)[None, :]
    tile_y = (jnp.arange(h) // bin_h)[:, None]

    def body(carry, g):
        T, C, D, done = carry
        dx = xy[g, 0] - xs
        dy = xy[g, 1] - ys
        power = (-0.5 * (conic[g, 0] * dx * dx + conic[g, 2] * dy * dy)
                 - conic[g, 1] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, opac[g] * jnp.exp(power))
        # exact tile-rect gating, identical to the binned backend
        inside = ((tile_x >= x0[g]) & (tile_x < x1[g])
                  & (tile_y >= y0[g]) & (tile_y < y1[g]))
        alpha = jnp.where((power <= 0.0) & inside, alpha, 0.0)
        alpha_ok = alpha >= ALPHA_MIN
        test_T = T * (1.0 - alpha)
        would_done = alpha_ok & (test_T < T_EPS)
        contrib = alpha_ok & ~would_done & ~done
        aT = jnp.where(contrib, alpha * T, 0.0)
        C = C + aT[..., None] * rgb[g]
        D = jnp.where(contrib & (T > 0.5) & (test_T < 0.5), depth[g], D)
        T = jnp.where(contrib, test_T, T)
        done = done | would_done
        return (T, C, D, done), None

    T0 = jnp.ones((h, w), jnp.float32)
    C0 = jnp.zeros((h, w, 3), jnp.float32)
    D0 = jnp.full((h, w), MEDIAN_DEPTH_DEFAULT, jnp.float32)
    done0 = jnp.zeros((h, w), bool)
    (T, C, D, _), _ = jax.lax.scan(body, (T0, C0, D0, done0),
                                   jnp.arange(xy.shape[0]))
    img = C + T[..., None] * bg
    return jnp.moveaxis(img, -1, 0), D


# ---------------------------------------------------------------------------
# pallas backend
# ---------------------------------------------------------------------------


def _composite_pallas(cam: Camera, pre: dict, bg: tuple,
                      config: RasterConfig):
    from .tile_kernel import rasterize_tiles

    h, w = cam.height, cam.width
    n = pre["xy"].shape[0]
    n_tiles_x = -(-w // TILE_W)
    n_tiles_y = -(-h // TILE_H)
    max_pairs = (config.max_pairs_override
                 or int(config.max_pairs_factor * n))
    max_pairs = -(-max_pairs // config.chunk) * config.chunk  # chunk-align

    bins = bin_gaussians(pre, n_tiles_x, n_tiles_y, TILE_W, TILE_H,
                         max_pairs, config.max_tiles_per_gaussian,
                         small_tiles=config.small_tiles,
                         max_large=config.max_large,
                         pack_payloads=config.pack_payloads,
                         mid_tiles=config.mid_tiles,
                         max_mid=config.max_mid)

    # pre-gather sorted pair data:
    # [x, y, conic_a, conic_b, conic_c, opacity, r, g, b, depth]
    data = gather_pair_table(pre, bins, n)

    rgb_pad, depth_pad = rasterize_tiles(
        data, bins["tile_starts"], bins["tile_ends"],
        n_tiles_x, n_tiles_y, chunk=config.chunk, bg=bg,
        interpret=config.interpret)
    return rgb_pad[:, :h, :w], depth_pad[:h, :w]
