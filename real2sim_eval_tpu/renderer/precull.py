"""Block-level conservative frustum pre-cull for moving (wrist) cameras.

The wrist camera re-runs the FULL pipeline (preprocess + slot emission +
pair sort) over every gaussian each step because it moves with the eef
(parallel/batched.py wrist path). Preprocess masks invisible gaussians,
but the slot-emission block is (N, d_small) and the pair sort input
scales with N*d_small REGARDLESS of visibility — at the ~100k-gaussian
scan scale that sort is the single largest render line. The CUDA
rasterizer does not pay this: its duplicateWithKeys compacts by a
prefix-sum over per-gaussian tile counts, so binning is O(visible)
(reference: third-party/diff-gaussian-rasterization-w-depth/
cuda_rasterizer/rasterizer_impl.cu:70-111,279 — tiles_touched of culled
gaussians is 0 and the scan skips them).

TPU-native equivalent (static shapes, no data-dependent compaction of
individual gaussians): a COARSE conservative cull at block granularity
over the STATIC part of the scene only. The static splats (meshes +
mask-0 scan) are constant across envs AND steps, so their block bounding
spheres are computed ONCE at evaluator build; the per-step work is one
(G,) sphere-vs-frustum test (G = N_static/64) plus an O(cap) gather —
after which preprocess, emission, and the sort all run on
n_dyn + cap*BLOCK gaussians instead of N.

  1. Group static gaussians into contiguous blocks of ``BLOCK`` (=64);
     optionally KD-order them first (``spatial_sort_scene``) so blocks
     are spatially tight regardless of scan file order.
  2. Once at build: per-block bounding sphere — circumradius of the
     block's means + 3x the largest member scale (the 3-sigma world
     ellipsoid bound).
  3. Per step / env: sphere test against the camera's four padded side
     planes (``PAD_PX`` px of slack against the EWA +0.3px low-pass and
     footprint-vs-ellipsoid linearization) and the z_threshold near plane
     (preprocess culls depth <= z_threshold, so a block entirely behind
     it emits nothing).
  4. Order-preserving compaction of surviving block ids to a CALIBRATED
     fixed capacity (measured visible blocks at build x margin — the
     renderer/calibrate.py pattern); overflow is loud via the returned
     per-env count. Capacity-fill slots get opacity 0 (-> valid=False in
     preprocess: zero pairs).

Because blocks keep their relative order and culled blocks emit no pair
(their footprints never intersect the image), the compacted scene's
sorted pair stream is IDENTICAL to the full scene's for every surviving
pair — same stable depth-rank tie order (argsort over a subsequence),
same tiles — so when budgets cover demand (drops=0 both ways) the render
is pixel-exact vs the unculled pipeline, not merely close
(tests/test_precull.py asserts equality over random poses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera

BLOCK = 64
# side-plane padding in pixels: covers the EWA +0.3px low-pass, the ceil
# on the 3-sigma radius, tile-rect dilation granularity, and linearization
# slack between the projected ellipsoid and the conic screen footprint
PAD_PX = 32.0
# margin over measured init visibility: the wrist camera SWEEPS the scene
# over an episode, so init-pose demand underestimates; overflow telemetry
# stays the loud backstop (parallel/batched.py wrist drop lane). Matches
# the calibrate.py PAIR_MARGIN convention.
CULL_MARGIN = 1.5

_SCENE_KEYS = ("means3D", "scales", "rotations", "opacities", "shs")


def pad_to_block(n: int) -> int:
    return -(-n // BLOCK) * BLOCK


def spatial_sort_scene(scene: dict) -> dict:
    """Reorder an (N, ...) scene dict by a balanced KD median split so
    contiguous BLOCK-slices are spatially tight even when the source file
    order isn't (scan PLYs): recursively split along the widest axis at a
    BLOCK-multiple rank, so every leaf is one compact axis-aligned cell of
    exactly BLOCK points (bar the tail) — unlike a Morton curve, no block
    straddles a Z-order quadrant jump. One-time host-side build step; all
    consumers of the static order (wrist concat) must use the SAME
    permuted scene."""
    m = np.asarray(scene["means3D"], np.float64)
    leaves = []

    def split(idx):
        if len(idx) <= BLOCK:
            leaves.append(idx)
            return
        pts = m[idx]
        ax = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        k = max(BLOCK, (len(idx) // 2 // BLOCK) * BLOCK)
        part = np.argpartition(pts[:, ax], k)
        split(idx[part[:k]])
        split(idx[part[k:]])

    split(np.arange(len(m)))
    order = np.concatenate(leaves)
    return {k: jnp.asarray(np.asarray(v)[order]) for k, v in scene.items()}


def pad_static_scene(scene: dict):
    """Pad an (N, ...) static scene dict to a BLOCK multiple. Pad means
    clone the last real row (keeps the tail block's sphere tight); pad
    opacities are 0 (invalid in preprocess -> zero pairs)."""
    n = scene["means3D"].shape[0]
    n_pad = pad_to_block(n)
    if n_pad == n:
        return scene
    pad = n_pad - n

    def padf(v, edge):
        cfg = [(0, 0)] * v.ndim
        cfg[0] = (0, pad)
        return jnp.pad(v, cfg, mode="edge" if edge else "constant")

    return {k: padf(v, edge=(k == "means3D")) for k, v in scene.items()}


def block_bounds(means, scales):
    """(N, 3) means + (N, 3) scales -> ((G, 3) centers, (G,) radii).

    N must be a multiple of BLOCK. Radius = circumradius of the block's
    means + 3 * the largest member scale (the 3-sigma ellipsoid bound);
    pad rows carry a real member's mean and scale 0, so they never
    inflate the sphere."""
    m = means.reshape(-1, BLOCK, 3)
    lo = jnp.min(m, axis=1)
    hi = jnp.max(m, axis=1)
    c = 0.5 * (lo + hi)
    d2 = jnp.sum((m - c[:, None, :]) ** 2, axis=-1)
    r = jnp.sqrt(jnp.max(d2, axis=1))
    r = r + 3.0 * jnp.max(scales.reshape(-1, BLOCK * 3), axis=1)
    return c, r


def visible_mask(cam: Camera, w2c, centers, radii, pad_px: float = PAD_PX):
    """(G,) conservative per-block visibility for one camera pose."""
    w2c = jnp.asarray(w2c, jnp.float32)
    cx, cy, cz = centers[:, 0], centers[:, 1], centers[:, 2]
    x = w2c[0, 0] * cx + w2c[0, 1] * cy + w2c[0, 2] * cz + w2c[0, 3]
    y = w2c[1, 0] * cx + w2c[1, 1] * cy + w2c[1, 2] * cz + w2c[1, 3]
    z = w2c[2, 0] * cx + w2c[2, 1] * cy + w2c[2, 2] * cz + w2c[2, 3]
    # near plane: valid requires depth > z_threshold (preprocess.py:50)
    ok = (z + radii) > cam.z_threshold
    # side planes of the pyramid through the padded image rect; each
    # half-space {sgn*v + tan*z >= 0} contains the visible frustum; a
    # sphere survives while its signed distance > -r
    tans = ((1.0, (cam.cx + pad_px) / cam.fx),
            (-1.0, (cam.width - cam.cx + pad_px) / cam.fx))
    for sgn, tan in tans:
        ok &= (sgn * x + tan * z) > -radii * jnp.sqrt(1.0 + tan * tan)
    tans = ((1.0, (cam.cy + pad_px) / cam.fy),
            (-1.0, (cam.height - cam.cy + pad_px) / cam.fy))
    for sgn, tan in tans:
        ok &= (sgn * y + tan * z) > -radii * jnp.sqrt(1.0 + tan * tan)
    return ok


def cull_static_blocks(cam: Camera, w2c_b, static_padded: dict, centers,
                       radii, cap_blocks: int, pad_px: float = PAD_PX):
    """Compact a shared (N, ...) static scene to the blocks visible from a
    per-env camera pose.

    Args:
      w2c_b: (B, 4, 4) world-to-camera per env.
      static_padded / centers / radii: from ``pad_static_scene`` +
        ``block_bounds`` — computed ONCE at evaluator build.
      cap_blocks: static capacity (from ``plan_static_cull``).
    Returns (culled scene dict with (B, cap_blocks*BLOCK, ...) leaves,
    overflow (B,) i32 — count of VISIBLE blocks beyond capacity, i.e.
    whole dropped blocks; loud in the caller's drop telemetry).
    """
    g = static_padded["means3D"].shape[0] // BLOCK
    cap = min(int(cap_blocks), g)
    flats = {k: static_padded[k].reshape(
        (g, BLOCK) + static_padded[k].shape[1:]) for k in _SCENE_KEYS}

    def one_env(w2c):
        ok = visible_mask(cam, w2c, centers, radii, pad_px)
        # order-preserving compaction: visible block ids ascend, invisible
        # sink to G; one tiny sort over G keys
        key = jnp.where(ok, jnp.arange(g, dtype=jnp.int32), jnp.int32(g))
        sel = jax.lax.sort(key)[:cap]
        n_vis = jnp.sum(ok.astype(jnp.int32))
        overflow = jnp.maximum(n_vis - cap, 0)
        real = sel < g
        sel_c = jnp.minimum(sel, g - 1)

        out = {}
        for k in _SCENE_KEYS:
            v = jnp.take(flats[k], sel_c, axis=0)
            out[k] = v.reshape((cap * BLOCK,) + v.shape[2:])
        op = out["opacities"]
        mask = jnp.repeat(real, BLOCK)
        out["opacities"] = jnp.where(
            mask.reshape((cap * BLOCK,) + (1,) * (op.ndim - 1)), op,
            jnp.zeros((), op.dtype))
        return out, overflow

    return jax.vmap(one_env)(jnp.asarray(w2c_b, jnp.float32))


def pad_dynamic_scene(scene_b: dict):
    """Pad a POSED (B, N, ...) dynamic scene dict to a BLOCK multiple
    along axis 1 (edge-cloned means, zero opacity — same convention as
    ``pad_static_scene`` for the per-step dynamic side)."""
    n = scene_b["means3D"].shape[1]
    n_pad = pad_to_block(n)
    if n_pad == n:
        return scene_b
    pad = n_pad - n

    def padf(v, edge):
        cfg = [(0, 0)] * v.ndim
        cfg[1] = (0, pad)
        return jnp.pad(v, cfg, mode="edge" if edge else "constant")

    return {k: padf(v, edge=(k == "means3D")) for k, v in scene_b.items()}


def cull_dynamic_blocks(cam: Camera, w2c_b, dyn_padded: dict,
                        cap_blocks: int, pad_px: float = PAD_PX):
    """Per-env block cull of a POSED (B, N, ...) DYNAMIC scene.

    The dynamic splats (LBS'd object + articulated robot) move every
    step, so unlike the static cull their block spheres cannot be
    precomputed — but they CAN be re-derived each step from the posed
    means the LBS already materialized: one O(N) min/max reduce per env
    (``block_bounds``), trivially cheap next to the preprocess + slot
    emission + pair sort the cull then shrinks to O(visible). Blocks are
    contiguous slices of the compose order (object splats are
    scan-locality-ordered; robot splats group by link), so posed blocks
    stay spatially tight without a per-step re-sort.

    Same exactness argument as ``cull_static_blocks``: compaction is
    order-preserving and culled blocks are conservatively off-frustum
    (zero pairs), so the surviving pair stream is IDENTICAL to the
    unculled pipeline's. Returns (culled (B, cap*BLOCK, ...) scene,
    overflow (B,) i32 — visible blocks beyond capacity).
    """
    g = dyn_padded["means3D"].shape[1] // BLOCK
    cap = min(int(cap_blocks), g)

    def one_env(w2c, scene):
        centers, radii = block_bounds(scene["means3D"], scene["scales"])
        ok = visible_mask(cam, w2c, centers, radii, pad_px)
        key = jnp.where(ok, jnp.arange(g, dtype=jnp.int32), jnp.int32(g))
        sel = jax.lax.sort(key)[:cap]
        n_vis = jnp.sum(ok.astype(jnp.int32))
        overflow = jnp.maximum(n_vis - cap, 0)
        real = sel < g
        sel_c = jnp.minimum(sel, g - 1)

        out = {}
        for k in _SCENE_KEYS:
            v = scene[k].reshape((g, BLOCK) + scene[k].shape[1:])
            v = jnp.take(v, sel_c, axis=0)
            out[k] = v.reshape((cap * BLOCK,) + v.shape[2:])
        op = out["opacities"]
        mask = jnp.repeat(real, BLOCK)
        out["opacities"] = jnp.where(
            mask.reshape((cap * BLOCK,) + (1,) * (op.ndim - 1)), op,
            jnp.zeros((), op.dtype))
        return out, overflow

    return jax.vmap(one_env)(jnp.asarray(w2c_b, jnp.float32), dyn_padded)


def plan_dynamic_cull(cam_w2c_list, dyn_padded: dict,
                      pad_px: float = PAD_PX,
                      margin: float = CULL_MARGIN) -> int:
    """Measured max visible DYNAMIC blocks over (cameras x envs) at the
    init pose -> capacity (x margin, rounded to 8, clamped). The margin
    absorbs in-episode articulation; overflow stays loud through the
    wrist drop telemetry lane."""
    g = int(dyn_padded["means3D"].shape[1]) // BLOCK

    def one(w2c, means, scales, _cam=None):
        centers, radii = block_bounds(means, scales)
        return jnp.sum(visible_mask(_cam, w2c, centers, radii, pad_px)
                       .astype(jnp.int32))

    mx = 0
    for cam, w2c_b in cam_w2c_list:
        counts = jax.jit(jax.vmap(functools.partial(one, _cam=cam)))(
            jnp.asarray(w2c_b, jnp.float32), dyn_padded["means3D"],
            dyn_padded["scales"])
        mx = max(mx, int(jax.device_get(jnp.max(counts))))
    cap = int(-(-mx * margin // 8) * 8) + 8
    return max(8, min(cap, g))


def plan_static_cull(cam_w2c_list, centers, radii,
                     pad_px: float = PAD_PX,
                     margin: float = CULL_MARGIN) -> int:
    """Measured max visible blocks over (cameras x envs) -> capacity
    (x margin, rounded up to 8 blocks, clamped to the block count)."""
    g = int(centers.shape[0])
    mx = 0
    for cam, w2c_b in cam_w2c_list:
        def one(w2c, _cam=cam):
            return jnp.sum(visible_mask(_cam, w2c, centers, radii, pad_px)
                           .astype(jnp.int32))
        counts = jax.jit(jax.vmap(one))(jnp.asarray(w2c_b, jnp.float32))
        mx = max(mx, int(jax.device_get(jnp.max(counts))))
    cap = int(-(-mx * margin // 8) * 8) + 8
    return max(8, min(cap, g))
