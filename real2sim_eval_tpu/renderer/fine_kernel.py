"""Pallas TPU kernel: fine-tile multi-stream compositing, length-grouped.

The wide (8,128)-pixel kernel (tile_kernel.py) spends ~24 VPU ops per
(gaussian, tile) pair with ~10% lane utilization (typical splat footprint
~10 px). This kernel composites 8 fine tiles of (8,16) pixels per launch,
walking their 8 depth-sorted pair streams in lockstep, so every (8,128)
vector op serves 8 pairs.

v2 design (the v1 spatial-supertile variant measured 14-16.7 ns/pair on
balanced streams but lost ~30% to stream divergence and re-rendered every
supertile that had ANY pairs):

  - **length-sorted grouping**: the 8 streams of a launch are not the 8
    fine tiles of one spatial supertile but 8 fine tiles of SIMILAR pair
    count (tiles sorted by stream length, grouped consecutively). Measured
    on the bench scene this lifts padding efficiency from 0.67-0.72 to
    0.99, and coalesces empty tiles into groups that exit after zero
    segments. Tile identities ride a third scalar-prefetch array; the
    (8,128) group outputs are scattered back to image layout by one XLA
    gather (~0.4 ms at B=64, far below the padding cost it removes).
  - **block-hoisted window mask**: stream-boundary masking (pairs of a
    neighboring tile sharing a packed row) is applied ONCE per 8-pair
    block to the opacity attr rows — an (8,128) iota compare — instead of
    3 ops in every per-pair step.
  - scratch is (GROUPS, SEGR, 128): per-stream DMA writes are contiguous
    and the per-block read is a strided middle-dim slice (a strided DMA
    destination faulted the TPU worker, so the v1 layout stays).

The packed pair table is ATTR-MAJOR: row r holds 8 consecutive sorted
pairs with lane [GPR*a + j] = attribute a of pair j. A block's per-attr
(8 pairs x 8 streams) matrix is a STATIC lane slice contracted with a
constant 0/1 expansion matrix on the MXU (~2.7 ns/pair measured), so
assembly needs no gathers or concats.

Compositing semantics are renderCUDA's, identical to tile_kernel.py
(reference: cuda_rasterizer/forward.cu:262-394 — 0.99 alpha clamp, 1/255
floor, T<1e-4 freeze with the crossing contribution excluded, median depth
at the T=0.5 crossing else 15.0, C + T*bg compositing).
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
GROUPS = 8       # fine streams per launch (== fine tiles per supertile)
SUP_H = 8
SUP_W = 128
FINE_W = SUP_W // GROUPS          # 16 px
KSEG = 64                         # pairs DMA'd per stream per segment
SEGR = KSEG // GPR + 1            # +1 covers the alignment phase
# total bytes of scalar-prefetch tables allowed per pallas_call (SMEM is
# ~1 MB/core and also holds kernel scalars; see rasterize_fine_batch)
SMEM_PREFETCH_BUDGET = 192_000


def pack_attr_major(lanes: list[jax.Array]) -> jax.Array:
    """10 sorted payload lane arrays (P,) -> (P/8, 128) attr-major rows
    (lane = GPR*a + j), via one transposing lax.reshape — a stacked
    (P/8, ATTR, GPR) intermediate tiles its 8-lane minor dim into 128
    (16x padded HBM at bench scale)."""
    p = lanes[0].shape[0]
    assert p % GPR == 0
    lanes = list(lanes) + [jnp.zeros_like(lanes[0])] * (ATTR - len(lanes))
    a = jnp.stack(lanes, axis=0).reshape(ATTR, p // GPR, GPR)
    return jax.lax.reshape(a, (p // GPR, ATTR * GPR), dimensions=(1, 0, 2))


def _kernel(tids_ref, starts_ref, ends_ref, data_hbm, rgb_ref, depth_ref, *,
            n_super_x: int, n_rows: int, bg,
            rgb_in_ref=None, depth_in_ref=None):
    """Fine multi-stream compositor. When cache refs are given (the sparse
    incremental path), lanes whose stream is EMPTY (start == end — clean
    fine tiles of a dirty supertile, or sentinel slots) write the cached
    pixels through instead of bg-compositing an empty walk."""
    g = pl.program_id(0)
    base = g * GROUPS

    tid_p = [tids_ref[base + p] for p in range(GROUPS)]
    start_p = [starts_ref[base + p] for p in range(GROUPS)]
    end_p = [ends_ref[base + p] for p in range(GROUPS)]
    arow_p = [start_p[p] // GPR for p in range(GROUPS)]
    lo_p = [start_p[p] - arow_p[p] * GPR for p in range(GROUPS)]
    hi_p = [end_p[p] - arow_p[p] * GPR for p in range(GROUPS)]
    kmax = hi_p[0]
    for p in range(1, GROUPS):
        kmax = jnp.maximum(kmax, hi_p[p])

    # per-stream pixel origins from the fine tile id t = s*GROUPS + q:
    # x0 = (s % n_super_x)*SUP_W + q*FINE_W, y0 = (s // n_super_x)*SUP_H
    x0_p = [(tid_p[p] // GROUPS) % n_super_x * SUP_W
            + tid_p[p] % GROUPS * FINE_W for p in range(GROUPS)]
    y0_p = [tid_p[p] // (GROUPS * n_super_x) * SUP_H for p in range(GROUPS)]

    # lane-group rows: group(c) = c // FINE_W; built once per launch
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (1, SUP_W), 1) // FINE_W
    zero_row = jnp.zeros((1, SUP_W), jnp.int32)
    lo_row, hi_row, x0_row, y0_row = zero_row, zero_row, zero_row, zero_row
    for p in range(GROUPS):
        sel = lane_grp == p
        lo_row = jnp.where(sel, lo_p[p], lo_row)
        hi_row = jnp.where(sel, hi_p[p], hi_row)
        x0_row = jnp.where(sel, x0_p[p], x0_row)
        y0_row = jnp.where(sel, y0_p[p], y0_row)

    lane16 = (jax.lax.broadcasted_iota(jnp.int32, (1, SUP_W), 1)
              % FINE_W)
    px = (x0_row + lane16).astype(jnp.float32)                # (1, SUP_W)
    py = (y0_row
          + jax.lax.broadcasted_iota(jnp.int32, (SUP_H, SUP_W), 0)
          ).astype(jnp.float32)                               # (8, SUP_W)

    # expansion matrix: E[p, FINE_W*p + q] = 1 — contracting a (p, j) attr
    # matrix over p against E yields lane group p holding stream p's value
    iot_r = jax.lax.broadcasted_iota(jnp.int32, (GROUPS, SUP_W), 0)
    iot_c = jax.lax.broadcasted_iota(jnp.int32, (GROUPS, SUP_W), 1)
    expand = (iot_c // FINE_W == iot_r).astype(jnp.float32)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (GPR, SUP_W), 0)

    def scoped(scratch, sems):
        def seg_cond(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            live = jnp.max(T * (1.0 - done)) >= T_EPS
            return (k0 < kmax) & live

        def seg_body(carry):
            k0, T, Cr, Cg, Cb, Dm, done = carry
            seg_row = k0 // GPR
            copies = []
            for p in range(GROUPS):
                r0 = jnp.minimum(arow_p[p] + seg_row, n_rows - SEGR)
                copies.append(pltpu.make_async_copy(
                    data_hbm.at[pl.ds(r0, SEGR), :],
                    scratch.at[p], sems.at[p]))
                copies[-1].start()
            for c in copies:
                c.wait()

            def block(carry):
                kb, T, Cr, Cg, Cb, Dm, done = carry
                # (GROUPS, 128) block: row kb of every stream's segment
                blk = scratch[:, pl.ds(kb, 1), :].reshape(GROUPS,
                                                          GPR * ATTR)
                # per-attr (j, lanes) rows via one MXU contraction each:
                # t2_a[j, c] = sum_p blk[p, GPR*a+j] * expand[p, c]
                t2 = []
                for a in range(10):
                    t1 = blk[:, GPR * a:GPR * (a + 1)]      # (p, j)
                    # HIGHEST: the MXU rounds operands to bf16 at default
                    # precision — fine in interpret mode, but on real TPU
                    # it truncates the f32 attr VALUES (conic/opacity/
                    # color/depth) to ~3 digits (chip smoke r4: max|rgb|
                    # 9.5e-2 -> 6.7e-3). expand is 0/1 (bf16-exact), so
                    # only t1 pays the 3-pass split; the dot is 8x8@8x128
                    t2.append(jax.lax.dot_general(
                        t1, expand, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32))  # (j, 128)
                # stream-boundary window mask, hoisted to one (8,128)
                # compare per block: pair j of the block is the stream's
                # local pair k0 + kb*GPR + j, live iff in [lo, hi)
                kbase = k0 + kb * GPR
                krow = jrow + kbase
                in_len = (krow >= lo_row) & (krow < hi_row)
                opac = jnp.where(in_len, t2[5], 0.0)

                def step(j, st):
                    T, Cr, Cg, Cb, Dm, done = st

                    def at(a, _j=j):
                        return t2[a][_j:_j + 1, :]            # (1, 128)

                    dx = at(0) - px
                    dy = at(1) - py
                    power = (-0.5 * (at(2) * dx * dx + at(4) * dy * dy)
                             - at(3) * dx * dy)
                    alpha = jnp.minimum(ALPHA_MAX,
                                        opac[j:j + 1, :] * jnp.exp(power))
                    alpha = jnp.where(power <= 0.0, alpha, 0.0)
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
        if rgb_in_ref is None:
            rgb_ref[0, 0] = Cr + T * bg[0]
            rgb_ref[0, 1] = Cg + T * bg[1]
            rgb_ref[0, 2] = Cb + T * bg[2]
            depth_ref[0] = Dm
        else:
            live = jnp.broadcast_to(hi_row > lo_row, (SUP_H, SUP_W))
            rgb_ref[0, 0] = jnp.where(live, Cr + T * bg[0],
                                      rgb_in_ref[0, 0])
            rgb_ref[0, 1] = jnp.where(live, Cg + T * bg[1],
                                      rgb_in_ref[0, 1])
            rgb_ref[0, 2] = jnp.where(live, Cb + T * bg[2],
                                      rgb_in_ref[0, 2])
            depth_ref[0] = jnp.where(live, Dm, depth_in_ref[0])

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
    fine_ends: (I, n_fine) GLOBAL pair offsets into data's pair space.
    Returns (rgb (I,3,Hp,Wp), depth (I,Hp,Wp)).

    Streams are grouped by descending length (argsort per instance), the
    kernel runs one launch per group of 8, and the group outputs are
    gathered back into supertile-major image layout.
    """
    n_inst = fine_starts.shape[0]
    n_super = n_super_x * n_super_y
    n_fine = fine_starts.shape[1]
    assert n_fine == n_super * GROUPS
    assert n_fine % GROUPS == 0
    n_groups = n_fine // GROUPS
    # prefetch scalars live in SMEM: split the instance axis when the
    # (I, n_fine) i32 tables outgrow the budget; every launch references
    # the full data buffer through global offsets. The budget bounds the
    # SUM of all three prefetch arrays (order/starts/ends) — round 5: a
    # per-array 0.3 MB bound let 3 x 295 KB of tables through at the
    # 848x480 wrist scale (n_fine=3360, 22 instances) and faulted the TPU
    # worker; ~1 MB SMEM must also hold the grid scalars
    max_inst = max(SMEM_PREFETCH_BUDGET // (3 * n_fine * 4), 1)
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

    # length-sorted grouping (descending, so group streams share length
    # and empty tiles coalesce into zero-iteration launches)
    lengths = fine_ends - fine_starts                        # (I, n_fine)
    order = jnp.argsort(-lengths, axis=1).astype(jnp.int32)  # (I, n_fine)
    starts_g = jnp.take_along_axis(fine_starts, order, axis=1)
    ends_g = jnp.take_along_axis(fine_ends, order, axis=1)

    kernel = functools.partial(
        _kernel, n_super_x=n_super_x, n_rows=n_rows, bg=bg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_inst * n_groups,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, SUP_H, SUP_W),
                         lambda g, t, s, e: (g, 0, 0, 0)),
            pl.BlockSpec((1, SUP_H, SUP_W),
                         lambda g, t, s, e: (g, 0, 0)),
        ],
    )
    rgb_g, depth_g = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_inst * n_groups, 3, SUP_H, SUP_W),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_inst * n_groups, SUP_H, SUP_W),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(order.reshape(-1), starts_g.reshape(-1), ends_g.reshape(-1), data)

    # scatter the (8,16) lane-group tiles back to supertile-major order:
    # sorted slot k of instance i rendered fine tile order[i, k]
    inv = jnp.argsort(order, axis=1)           # (I, n_fine)
    rgb_t = (rgb_g.reshape(n_inst, n_groups, 3, SUP_H, GROUPS, FINE_W)
             .transpose(0, 1, 4, 2, 3, 5)
             .reshape(n_inst, n_fine, 3 * SUP_H * FINE_W))
    rgb_t = jnp.take_along_axis(rgb_t, inv[:, :, None], axis=1)
    rgb = (rgb_t.reshape(n_inst, n_super_y, n_super_x, GROUPS,
                         3, SUP_H, FINE_W)
           .transpose(0, 4, 1, 5, 2, 3, 6)
           .reshape(n_inst, 3, h_pad, w_pad))
    dep_t = (depth_g.reshape(n_inst, n_groups, SUP_H, GROUPS, FINE_W)
             .transpose(0, 1, 3, 2, 4)
             .reshape(n_inst, n_fine, SUP_H * FINE_W))
    dep_t = jnp.take_along_axis(dep_t, inv[:, :, None], axis=1)
    depth = (dep_t.reshape(n_inst, n_super_y, n_super_x, GROUPS,
                           SUP_H, FINE_W)
             .transpose(0, 1, 4, 2, 3, 5)
             .reshape(n_inst, h_pad, w_pad))
    return rgb, depth
