"""Pallas TPU kernel: multi-stream front-to-back compositing (octet layout).

The wide (8,128)-pixel tile kernel (tile_kernel.py) pays ~24 VPU ops per
(gaussian, tile) pair with most of the 128 lanes wasted: a typical splat
footprint is ~10 px. This kernel splits each (8,128) SUPERTILE into G
x-adjacent FINE tiles of (8, 128/G) pixels and walks G depth-sorted pair
streams in lockstep — every (8,128) vector op now serves G pairs at once,
so the per-pair cost drops toward 24/G (plus stream-length padding, since
a supertile steps to its LONGEST fine stream).

Mechanics per (instance, supertile) grid step:
  - the G fine tiles' pair ranges are CONTIGUOUS in the fine-sorted table;
    each stream's segment is DMA'd separately (packed 8-pairs-per-row
    rows; arbitrary phase handled by an in-register reshape + dynamic
    row slice, no alignment pass needed);
  - per 8-step block, per attribute, a (8,128) row matrix is assembled by
    concatenating per-stream (8,1)->(8,W) lane broadcasts: row k holds
    attribute a of each stream's k-th pair, already lane-aligned with its
    fine tile's pixels;
  - per step, the 7 attribute rows broadcast over the 8 pixel rows and the
    compositing math is IDENTICAL to tile_kernel/renderCUDA
    (forward.cu:262-394 semantics: 0.99 alpha clamp, 1/255 floor, T<1e-4
    freeze, median depth at the T=0.5 crossing, bg compositing).
  - stream-length masking (k < count_p) guarantees pairs from neighboring
    tiles' table rows never contribute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import ALPHA_MAX, ALPHA_MIN, MEDIAN_DEPTH_DEFAULT, T_EPS

GPR = 8          # gaussians per packed table row (shared with tile_kernel)
ATTR = 16
SUP_H = 8
SUP_W = 128
KSEG = 256       # stream steps DMA'd per segment
SEGR = KSEG // GPR + 1


def _bcast_groups(parts, width):
    """[(8,1) per group] -> (8, 128): each part broadcast to its lane group."""
    return jnp.concatenate(
        [jnp.broadcast_to(p, (p.shape[0], width)) for p in parts], axis=1)


def _kernel(starts_ref, ends_ref, data_hbm, rgb_ref, depth_ref, *,
            groups: int, n_super_x: int, n_super: int, n_fine_x: int,
            n_rows: int, bg):
    G = groups
    W = SUP_W // G
    g = pl.program_id(0)
    s = g % n_super
    inst = g // n_super
    sy = s // n_super_x
    sx = s % n_super_x
    fbase = inst * (n_fine_x * (n_super // n_super_x)) + sy * n_fine_x \
        + sx * G

    # each stream walks PACKED-ALIGNED 8-pair blocks from its own aligned
    # base row; boundary pairs (belonging to neighboring tiles) are masked
    # by the per-stream [lo, hi) validity window in block-local indices —
    # Mosaic has no dynamic value slicing, so alignment replaces phase math
    start_p = [starts_ref[fbase + p] for p in range(G)]
    end_p = [ends_ref[fbase + p] for p in range(G)]
    arow_p = [start_p[p] // GPR for p in range(G)]
    lo_p = [start_p[p] - arow_p[p] * GPR for p in range(G)]
    hi_p = [end_p[p] - arow_p[p] * GPR for p in range(G)]
    kmax = hi_p[0]
    for p in range(1, G):
        kmax = jnp.maximum(kmax, hi_p[p])

    px = (sx * SUP_W
          + jax.lax.broadcasted_iota(jnp.int32, (SUP_H, SUP_W), 1)
          ).astype(jnp.float32)
    py = (sy * SUP_H
          + jax.lax.broadcasted_iota(jnp.int32, (SUP_H, SUP_W), 0)
          ).astype(jnp.float32)
    def scoped(scratch, sems):
        # per-group validity windows as lane rows (mask boundary pairs of
        # neighboring tiles inside the aligned first/last blocks)
        lo_row = _bcast_groups(
            [jnp.full((1, 1), lo_p[p], jnp.float32) for p in range(G)], W)
        hi_row = _bcast_groups(
            [jnp.full((1, 1), hi_p[p], jnp.float32) for p in range(G)], W)

        def seg_cond(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            live = jnp.max(T * (1.0 - done)) >= T_EPS
            return (k0 < kmax) & live

        def seg_body(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            seg_row = k0 // GPR
            for p in range(G):
                r0 = jnp.minimum(arow_p[p] + seg_row, n_rows - SEGR)
                cp = pltpu.make_async_copy(
                    data_hbm.at[pl.ds(r0, SEGR), :],
                    scratch.at[p], sems.at[p])
                cp.start()
            for p in range(G):
                r0 = jnp.minimum(arow_p[p] + seg_row, n_rows - SEGR)
                pltpu.make_async_copy(
                    data_hbm.at[pl.ds(r0, SEGR), :],
                    scratch.at[p], sems.at[p]).wait()

            def block(kb, inner):
                # per-pair attributes come straight off the packed (1,128)
                # rows as STATIC (1,1) lane slices broadcast per fine tile:
                # Mosaic has no lane->sublane shape casts, but (1,1)
                # extract + splat + lane-concat lower cleanly
                rows = [scratch[p, pl.ds(kb, 1), :] for p in range(G)]

                def attr(j, a):
                    return _bcast_groups(
                        [rows[p][:, j * ATTR + a:j * ATTR + a + 1]
                         for p in range(G)], W)

                def step(j, st):
                    # j is a static python int: value indexing below must
                    # stay static — Mosaic has no dynamic_slice on values
                    T, Cr, Cg, Cb, Dm, done = st
                    k = k0 + kb * GPR + j
                    kf = jnp.float32(0.0) + k
                    in_len = (kf >= lo_row) & (kf < hi_row)     # (1, 128)
                    gx = attr(j, 0)
                    gy = attr(j, 1)
                    ca = attr(j, 2)
                    cb = attr(j, 3)
                    cc = attr(j, 4)
                    op = jnp.where(in_len, attr(j, 5), 0.0)
                    rr = attr(j, 6)
                    gr = attr(j, 7)
                    br = attr(j, 8)
                    dr = attr(j, 9)
                    dx = gx - px
                    dy = gy - py
                    power = (-0.5 * (ca * dx * dx + cc * dy * dy)
                             - cb * dx * dy)
                    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                    alpha = jnp.where(power <= 0.0, alpha, 0.0)
                    alpha_ok = alpha >= ALPHA_MIN
                    test_T = T * (1.0 - alpha)
                    would_done = alpha_ok & (test_T < T_EPS)
                    contrib = alpha_ok & (~would_done) & (done < 0.5)
                    aT = jnp.where(contrib, alpha * T, 0.0)
                    Cr = Cr + aT * rr
                    Cg = Cg + aT * gr
                    Cb = Cb + aT * br
                    Dm = jnp.where(contrib & (T > 0.5) & (test_T < 0.5),
                                   dr, Dm)
                    T = jnp.where(contrib, test_T, T)
                    done = jnp.maximum(done,
                                       jnp.where(would_done, 1.0, 0.0))
                    return T, Cr, Cg, Cb, Dm, done

                st = inner
                for j in range(GPR):   # unrolled: static value indices
                    st = step(j, st)
                return st

            n_blocks = jnp.minimum(
                pl.cdiv(kmax - k0, GPR), KSEG // GPR)
            T, Cr, Cg, Cb, Dm, done = jax.lax.fori_loop(
                0, n_blocks, block, (T, Cr, Cg, Cb, Dm, done))
            return k0 + KSEG, T, Cr, Cg, Cb, Dm, done

        shape = (SUP_H, SUP_W)
        init = (jnp.int32(0),
                jnp.ones(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.full(shape, MEDIAN_DEPTH_DEFAULT, jnp.float32),
                jnp.zeros(shape, jnp.float32))
        _, T, Cr, Cg, Cb, Dm, _ = jax.lax.while_loop(seg_cond, seg_body,
                                                     init)
        rgb_ref[0, 0] = Cr + T * bg[0]
        rgb_ref[0, 1] = Cg + T * bg[1]
        rgb_ref[0, 2] = Cb + T * bg[2]
        depth_ref[0] = Dm

    pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((groups, SEGR, GPR * ATTR), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((groups,)),
    )


@functools.partial(jax.jit, static_argnames=("groups", "n_super_x",
                                             "n_super_y", "bg", "interpret"))
def rasterize_octet_batch(data, fine_starts, fine_ends, groups, n_super_x,
                          n_super_y, bg, interpret=False):
    """data: (rows, 128) packed pair table, fine-tile sorted, all instances
    concatenated (chunk-aligned segments). fine_starts/ends: (I, n_fine)
    with GLOBAL pair offsets. Returns (rgb (I,3,Hp,Wp), depth (I,Hp,Wp))."""
    n_inst = fine_starts.shape[0]
    n_super = n_super_x * n_super_y
    n_fine_x = n_super_x * groups
    n_fine = fine_starts.shape[1]
    # prefetch scalars live in SMEM (1 MiB budget per operand): split the
    # instance axis over multiple launches when (I, n_fine) i32 won't fit;
    # every launch references the FULL data buffer with global offsets
    max_inst = max(int(0.45e6) // (n_fine * 4), 1)
    if n_inst > max_inst:
        outs = [rasterize_octet_batch(
            data, fine_starts[i:i + max_inst], fine_ends[i:i + max_inst],
            groups, n_super_x, n_super_y, bg, interpret)
            for i in range(0, n_inst, max_inst)]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))
    # segment DMA may over-read up to SEGR rows past the last pair
    data = jnp.pad(data, ((0, SEGR), (0, 0)))
    n_rows = data.shape[0]
    h_pad = n_super_y * SUP_H
    w_pad = n_super_x * SUP_W

    kernel = functools.partial(
        _kernel, groups=groups, n_super_x=n_super_x, n_super=n_super,
        n_fine_x=n_fine_x, n_rows=n_rows, bg=bg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_inst * n_super,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, SUP_H, SUP_W),
                         lambda g, s, e: (g // n_super, 0,
                                          (g % n_super) // n_super_x,
                                          g % n_super_x)),
            pl.BlockSpec((1, SUP_H, SUP_W),
                         lambda g, s, e: (g // n_super,
                                          (g % n_super) // n_super_x,
                                          g % n_super_x)),
        ],
    )
    rgb, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_inst, 3, h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, h_pad, w_pad), jnp.float32),
        ],
        interpret=interpret,
    )(fine_starts.reshape(-1), fine_ends.reshape(-1), data)
    return rgb, depth
