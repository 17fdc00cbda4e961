"""Pallas TPU kernel: fine-tile multi-stream compositing with MXU assembly.

The wide (8,128)-pixel kernel (tile_kernel.py) spends ~24 VPU ops per
(gaussian, tile) pair with ~10% lane utilization (typical splat footprint
~10 px). This kernel splits each (8,128) SUPERTILE into G=8 fine tiles of
(8,16) pixels and walks the 8 depth-sorted fine pair streams in lockstep,
so every (8,128) vector op serves 8 pairs.

What makes it faster than the octet kernel (octet_kernel.py, the round-2
attempt that LOST its theoretical win to per-attr lane concats):

  - the packed pair table is ATTR-MAJOR: row r holds 8 consecutive sorted
    pairs with lane [16a + j] = attribute a of pair j. A block's per-attr
    (8 pairs x 8 streams) matrix is then a STATIC lane slice blk[:, 16a:
    16a+8] — no gather, no concat;
  - the slice contracts with a constant 0/1 expansion matrix on the MXU
    (dot_general over the stream axis), producing the (steps, 128) row
    block whose lane group p broadcasts stream p's attribute — assembly
    is 1 slice + 1 tiny matmul per attribute per 8-step block, amortized
    over 64 pairs;
  - per step, attribute rows are (1,128) slices that broadcast against the
    (8,128) pixel block inside each math op (no explicit broadcasts).

Compositing semantics are renderCUDA's, identical to tile_kernel.py
(reference: cuda_rasterizer/forward.cu:262-394 — 0.99 alpha clamp, 1/255
floor, T<1e-4 freeze with the crossing contribution excluded, median depth
at the T=0.5 crossing else 15.0, C + T*bg compositing). Stream-boundary
pairs (neighbor tiles sharing a packed row) are masked by per-stream
[lo, hi) windows exactly as in the octet kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import ALPHA_MAX, ALPHA_MIN, MEDIAN_DEPTH_DEFAULT, T_EPS

GPR = 8          # pairs per packed table row
ATTR = 16        # attr lanes per pair (10 used)
GROUPS = 8       # fine streams per supertile
SUP_H = 8
SUP_W = 128
FINE_W = SUP_W // GROUPS          # 16 px
KSEG = 64                         # pairs DMA'd per stream per segment
SEGR = KSEG // GPR + 1            # +1 covers the alignment phase


def pack_attr_major(lanes: list[jax.Array]) -> jax.Array:
    """10 sorted payload lane arrays (P,) -> (P/8, 128) attr-major rows."""
    p = lanes[0].shape[0]
    assert p % GPR == 0
    cols = [v.reshape(-1, GPR) for v in lanes]
    cols += [jnp.zeros_like(cols[0])] * (ATTR - len(cols))
    return jnp.stack(cols, axis=1).reshape(-1, ATTR * GPR)


def _kernel(starts_ref, ends_ref, data_hbm, rgb_ref, depth_ref, *,
            n_super_x: int, n_super: int, n_rows: int, bg):
    g = pl.program_id(0)
    s = g % n_super
    inst = g // n_super
    sy = s // n_super_x
    sx = s % n_super_x
    # fine tile ids are supertile-major: tiles of supertile s are
    # [s*GROUPS, (s+1)*GROUPS) in the sorted key space
    fbase = (inst * n_super + s) * GROUPS

    start_p = [starts_ref[fbase + p] for p in range(GROUPS)]
    end_p = [ends_ref[fbase + p] for p in range(GROUPS)]
    arow_p = [start_p[p] // GPR for p in range(GROUPS)]
    lo_p = [start_p[p] - arow_p[p] * GPR for p in range(GROUPS)]
    hi_p = [end_p[p] - arow_p[p] * GPR for p in range(GROUPS)]
    kmax = hi_p[0]
    for p in range(1, GROUPS):
        kmax = jnp.maximum(kmax, hi_p[p])

    px = (sx * SUP_W
          + jax.lax.broadcasted_iota(jnp.int32, (SUP_H, SUP_W), 1)
          ).astype(jnp.float32)
    py = (sy * SUP_H
          + jax.lax.broadcasted_iota(jnp.int32, (SUP_H, SUP_W), 0)
          ).astype(jnp.float32)

    # lane-group constants: group(c) = c // FINE_W; built once per tile
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (1, SUP_W), 1) // FINE_W
    lo_row = jnp.zeros((1, SUP_W), jnp.float32)
    hi_row = jnp.zeros((1, SUP_W), jnp.float32)
    for p in range(GROUPS):
        sel = lane_grp == p
        lo_row = jnp.where(sel, jnp.float32(0.0) + lo_p[p], lo_row)
        hi_row = jnp.where(sel, jnp.float32(0.0) + hi_p[p], hi_row)

    # expansion matrix: E[p, FINE_W*p + q] = 1 — contracting a (p, j) attr
    # matrix over p against E yields lane group p holding stream p's value
    iot_r = jax.lax.broadcasted_iota(jnp.int32, (GROUPS, SUP_W), 0)
    iot_c = jax.lax.broadcasted_iota(jnp.int32, (GROUPS, SUP_W), 1)
    expand = (iot_c // FINE_W == iot_r).astype(jnp.float32)

    def scoped(scratch, sems):
        def seg_cond(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            live = jnp.max(T * (1.0 - done)) >= T_EPS
            return (k0 < kmax) & live

        def seg_body(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            seg_row = k0 // GPR
            for p in range(GROUPS):
                r0 = jnp.minimum(arow_p[p] + seg_row, n_rows - SEGR)
                pltpu.make_async_copy(
                    data_hbm.at[pl.ds(r0, SEGR), :],
                    scratch.at[p], sems.at[p]).start()
            for p in range(GROUPS):
                r0 = jnp.minimum(arow_p[p] + seg_row, n_rows - SEGR)
                pltpu.make_async_copy(
                    data_hbm.at[pl.ds(r0, SEGR), :],
                    scratch.at[p], sems.at[p]).wait()

            def block(carry):
                kb, T, Cr, Cg, Cb, Dm, done = carry
                # (GROUPS, 128) block: stream p's row kb of its segment
                blk = scratch[:, pl.ds(kb, 1), :].reshape(GROUPS,
                                                          GPR * ATTR)
                # per-attr (j, lanes) rows via one MXU contraction each:
                # T2_a[j, c] = sum_p blk[p, 16a+j] * expand[p, c]
                t2 = []
                for a in range(10):
                    # attr-major lane layout: lane GPR*a + j (pack_attr_major)
                    t1 = blk[:, GPR * a:GPR * (a + 1)]      # (p, j)
                    t2.append(jax.lax.dot_general(
                        t1, expand, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))  # (j, 128)

                def step(j, st):
                    T, Cr, Cg, Cb, Dm, done = st
                    k = k0 + kb * GPR + j
                    kf = jnp.float32(0.0) + k
                    in_len = (kf >= lo_row) & (kf < hi_row)   # (1, 128)

                    def at(a, _j=j):
                        return t2[a][_j:_j + 1, :]            # (1, 128)

                    dx = at(0) - px
                    dy = at(1) - py
                    power = (-0.5 * (at(2) * dx * dx + at(4) * dy * dy)
                             - at(3) * dx * dy)
                    alpha = jnp.minimum(ALPHA_MAX, at(5) * jnp.exp(power))
                    alpha = jnp.where((power <= 0.0) & in_len, alpha, 0.0)
                    alpha_ok = alpha >= ALPHA_MIN
                    test_T = T * (1.0 - alpha)
                    would_done = alpha_ok & (test_T < T_EPS)
                    contrib = alpha_ok & (~would_done) & (done < 0.5)
                    aT = jnp.where(contrib, alpha * T, 0.0)
                    Cr = Cr + aT * at(6)
                    Cg = Cg + aT * at(7)
                    Cb = Cb + aT * at(8)
                    Dm = jnp.where(contrib & (T > 0.5) & (test_T < 0.5),
                                   at(9) + jnp.zeros_like(Dm), Dm)
                    T = jnp.where(contrib, test_T, T)
                    done = jnp.maximum(done,
                                       jnp.where(would_done, 1.0, 0.0))
                    return T, Cr, Cg, Cb, Dm, done

                st = (T, Cr, Cg, Cb, Dm, done)
                for j in range(GPR):
                    st = step(j, st)
                T, Cr, Cg, Cb, Dm, done = st
                return kb + 1, T, Cr, Cg, Cb, Dm, done

            def block_cond(carry):
                kb, T, _, _, _, _, done = carry
                n_blocks = jnp.minimum(pl.cdiv(kmax - k0, GPR), KSEG // GPR)
                return (kb < n_blocks) & \
                    (jnp.max(T * (1.0 - done)) >= T_EPS)

            _, T, Cr, Cg, Cb, Dm, done = jax.lax.while_loop(
                block_cond, block, (jnp.int32(0), T, Cr, Cg, Cb, Dm, done))
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
        scratch=pltpu.VMEM((GROUPS, SEGR, GPR * ATTR), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((GROUPS,)),
    )


@functools.partial(jax.jit, static_argnames=("n_super_x", "n_super_y", "bg",
                                             "interpret"))
def rasterize_fine_batch(data, fine_starts, fine_ends, n_super_x, n_super_y,
                         bg, interpret=False):
    """data: (rows, 128) attr-major packed pair table, fine-tile sorted
    (supertile-major fine ids), all instances concatenated. fine_starts /
    fine_ends: (I, n_fine) GLOBAL pair offsets. Returns
    (rgb (I,3,Hp,Wp), depth (I,Hp,Wp))."""
    n_inst = fine_starts.shape[0]
    n_super = n_super_x * n_super_y
    n_fine = fine_starts.shape[1]
    assert n_fine == n_super * GROUPS
    # prefetch scalars live in SMEM: split the instance axis when the
    # (I, n_fine) i32 tables outgrow the budget; every launch references
    # the full data buffer through global offsets
    max_inst = max(int(0.45e6) // (n_fine * 4), 1)
    if n_inst > max_inst:
        outs = [rasterize_fine_batch(
            data, fine_starts[i:i + max_inst], fine_ends[i:i + max_inst],
            n_super_x, n_super_y, bg, interpret)
            for i in range(0, n_inst, max_inst)]
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))
    data = jnp.pad(data, ((0, SEGR), (0, 0)))   # segment DMA over-read room
    n_rows = data.shape[0]
    h_pad = n_super_y * SUP_H
    w_pad = n_super_x * SUP_W

    kernel = functools.partial(
        _kernel, n_super_x=n_super_x, n_super=n_super, n_rows=n_rows, bg=bg)
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
