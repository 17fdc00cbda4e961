"""Fused physics control step: the whole substep loop inside Pallas kernels.

Round-1 profiling showed the XLA scan path is dispatch-bound: ~20 fused
kernels per substep x ~13 us fixed cost x 667 substeps ~= 175 ms/control
step of pure launch overhead (BASELINE.md "Recorded results"). This module
is the TPU answer to the reference's CUDA-graph capture of the substep loop
(reference: sim/physics/spring_mass_warp.py:723-726, phystwin.py:515-517):
instead of replaying a pre-captured launch sequence, an entire chunk of K
substeps runs inside ONE Pallas kernel (`jax.lax.fori_loop`), so per-substep
cost is pure VPU arithmetic instead of kernel dispatch.

TPU-native structure (Mosaic supports no general gather/scatter, so every
irregular access is restructured):

  spring forces    -> half-offset rolled tables + `pltpu.roll` along lanes
                      (each spring evaluated once; the reaction force is
                      rolled back to the far endpoint). Requires rolled
                      topology (physics/topology.build_rolled_tables).
  self-collision   -> candidate slots frozen per control step (exactly the
                      XLA path's compact_candidate_slots); the per-substep
                      x/v gather runs as a two-level within-128-lane
                      `take_along_axis` (Mosaic's one supported gather
                      shape); the velocity scatter-back is inverted into a
                      gather through a precomputed inverse index map.
  SDF mesh contact -> per chunk, every contact particle gets a private
                      4x4x4 SDF patch (ONE gathered row per particle from
                      the pack_blocks4 table, built in XLA between chunks);
                      in-kernel trilinear value+gradient are select-chains
                      over the 64 statically-addressed patch planes — no
                      gather at all. Patch validity needs per-chunk particle
                      travel < ~1 voxel; K is sized so typical manipulation
                      speeds stay well inside.
  batching         -> environments ride the VPU sublane dimension (8 envs
                      per grid program); B>8 adds grid programs with
                      per-group block streaming.

Semantics match physics/spring_mass.py op-for-op (same formulas, same
once-per-control-step candidate freezing, same double-integration quirk;
that module carries the reference file:line citations);
tests/test_pallas_step.py diffs the two backends directly.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sdf import SdfGrid, blocks4_dims, pack_blocks4
from .spring_mass import (MeshColliderSet, PhysicsOptions, SpringMassParams,
                          SpringMassState, SubstepControls,
                          _substep_pose_tables, build_candidate_slots,
                          select_contact_particles)

LANE = 128
EPP = 8   # envs per grid program (VPU sublanes)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_pallas(opts: PhysicsOptions, params: SpringMassParams) -> bool:
    """The fused path needs rolled spring topology and 128-aligned budgets."""
    return (params.roll_rest is not None
            and opts.max_self_particles % LANE == 0
            and opts.max_contact_particles % LANE == 0
            and opts.max_self_slots >= 1)


def best_chunk(n_substeps: int, max_k: int = 32) -> tuple[int, int, int]:
    """Chunking of the substep loop: (K, n_full_chunks, remainder).

    Prefers the largest divisor of n_substeps <= max_k (one compiled kernel,
    e.g. 667 -> 29x23); falls back to fixed-K chunks plus one remainder
    kernel when the best divisor is small (prime-ish counts). K bounds
    per-chunk particle travel (the SDF patch budget is ~1 voxel = 2.5 mm):
    at K=29, dt=5e-5, a 1 m/s relative speed moves 1.45 mm."""
    max_k = min(max_k, n_substeps)
    for k in range(max_k, 0, -1):
        if n_substeps % k == 0 and k >= max_k // 2:
            return k, n_substeps // k, 0
    return max_k, n_substeps // max_k, n_substeps % max_k


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on (rows, lanes) f32 values)
# ---------------------------------------------------------------------------


def _roll(x, shift, n):
    """Lane-roll by +shift (mod n): out[i] = x[i - shift]."""
    return pltpu.roll(x, shift % n, 1)


def _gather_lanes(tables, hi, lo, n_tiles):
    """Two-level lane gather: out[r, q] = table[r, hi[r,q]*128 + lo[r,q]].

    Mosaic's take_along_axis only lowers for (rows, 128) blocks with
    idx < 128, so the gather walks idx groups x source tiles; the hi-select
    masks are shared across the gathered tables."""
    rows, q = lo.shape
    outs = [[] for _ in tables]
    for g in range(q // LANE):
        lo_g = lo[:, g * LANE:(g + 1) * LANE]
        hi_g = hi[:, g * LANE:(g + 1) * LANE]
        accs = [None] * len(tables)
        for t in range(n_tiles):
            m = hi_g == t
            for i, tab in enumerate(tables):
                v = jnp.take_along_axis(tab[:, t * LANE:(t + 1) * LANE],
                                        lo_g, axis=1)
                accs[i] = v if accs[i] is None else jnp.where(m, v, accs[i])
        for i in range(len(tables)):
            outs[i].append(accs[i])
    return [jnp.concatenate(o, axis=1) for o in outs]


def _sel3(i_arr, a, b, c):
    """Elementwise select among three arrays by integer i_arr in {0,1,2}."""
    return jnp.where(i_arr <= 0, a, jnp.where(i_arr <= 1, b, c))


def _patch_trilinear(plane, ux, uy, uz):
    """Trilinear SDF value + gradient (grid units) from a 4^3 patch.

    ``plane(a, b, z)`` returns the (rows, lanes) voxel plane at patch coord
    (a, b, z). u*: patch-local coords already clipped to [0, 3-eps].
    Returns (val, gx, gy, gz) — gradient in grid units. The lerp chain is
    op-for-op physics/sdf.py's sdf_query (which carries the reference
    citations), so values match the XLA backend bit-for-bit on shared
    corner data."""
    ix = jnp.floor(ux).astype(jnp.int32)
    iy = jnp.floor(uy).astype(jnp.int32)
    iz = jnp.floor(uz).astype(jnp.int32)
    fx = ux - ix.astype(ux.dtype)
    fy = uy - iy.astype(uy.dtype)
    fz = uz - iz.astype(uz.dtype)

    # the 8 corner values resolve through a shared select tree (z, then y,
    # then x) so each patch plane is read exactly once
    w0 = {}
    w1 = {}
    for a in range(4):
        for b in range(4):
            w0[(a, b)] = _sel3(iz, plane(a, b, 0), plane(a, b, 1),
                               plane(a, b, 2))
            w1[(a, b)] = _sel3(iz, plane(a, b, 1), plane(a, b, 2),
                               plane(a, b, 3))
    c0y0 = {}
    c0y1 = {}
    c1y0 = {}
    c1y1 = {}
    for a in range(4):
        c0y0[a] = _sel3(iy, w0[(a, 0)], w0[(a, 1)], w0[(a, 2)])
        c0y1[a] = _sel3(iy, w0[(a, 1)], w0[(a, 2)], w0[(a, 3)])
        c1y0[a] = _sel3(iy, w1[(a, 0)], w1[(a, 1)], w1[(a, 2)])
        c1y1[a] = _sel3(iy, w1[(a, 1)], w1[(a, 2)], w1[(a, 3)])
    c000 = _sel3(ix, c0y0[0], c0y0[1], c0y0[2])
    c010 = _sel3(ix, c0y1[0], c0y1[1], c0y1[2])
    c001 = _sel3(ix, c1y0[0], c1y0[1], c1y0[2])
    c011 = _sel3(ix, c1y1[0], c1y1[1], c1y1[2])
    c100 = _sel3(ix, c0y0[1], c0y0[2], c0y0[3])
    c110 = _sel3(ix, c0y1[1], c0y1[2], c0y1[3])
    c101 = _sel3(ix, c1y0[1], c1y0[2], c1y0[3])
    c111 = _sel3(ix, c1y1[1], c1y1[2], c1y1[3])

    # identical interpolant to sdf.sdf_query:141-167
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    val = c0 * (1 - fx) + c1 * fx

    gx = c1 - c0
    gy = (c01 - c00) * (1 - fx) + (c11 - c10) * fx
    gz = (((c001 - c000) * (1 - fy) + (c011 - c010) * fy) * (1 - fx)
          + ((c101 - c100) * (1 - fy) + (c111 - c110) * fy) * fx)
    return val, gx, gy, gz


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Static:
    """Compile-time constants of the fused kernel."""

    opts: PhysicsOptions
    K: int                      # substeps per kernel invocation
    Np: int                     # particle lanes (128-aligned)
    offsets: tuple              # positive spring offsets (half tables)
    n_f: int                    # dynamic colliders
    C: int                      # total colliders (>= 1 placeholder)
    inv_spacing: tuple          # per-collider python floats
    origin: tuple               # per-collider (3,) python floats
    dims: tuple                 # per-collider TRUE grid shape (3,) ints
    M: int                      # self-collision particle budget
    Ks: int                     # self-collision slots per particle
    PM: int                     # contact particle budget
    has_colliders: bool
    self_collision: bool


def _kernel(st: _Static, scal_ref,
            x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref,
            minv_ref, rrest_ref, ry_ref, rdamp_ref,
            schi_ref, sclo_ref, scok_ref, scinvm_ref, scminv_ref, scinv_ref,
            cdhi_ref, cdlo_ref, cdok_ref, cdinv_ref,
            trc_ref, dyn_ref, pv_ref, porg_ref, ffi_ref,
            xo_ref, yo_ref, zo_ref, vxo_ref, vyo_ref, vzo_ref, ff_ref):
    opts = st.opts
    Np = st.Np
    n_tiles = Np // LANE
    dt = opts.dt
    rev = opts.reverse_factor
    gz_const = -9.8 * rev
    C, n_f = st.C, st.n_f
    M, Ks, PM = st.M, st.Ks, st.PM

    elas_g = scal_ref[0]       # pre-clipped outside the kernel
    fric_g = scal_ref[1]
    elas_e = scal_ref[2]
    fric_e = scal_ref[3]
    elas_s = scal_ref[4]
    fric_s = scal_ref[5]
    decay = scal_ref[6]        # exp(-dt*drag), folded by XLA outside

    minv = minv_ref[0, :][None, :]                      # (1, Np) row

    if st.self_collision:
        sc_hi = schi_ref[:]
        sc_lo = sclo_ref[:]
        sc_ok = scok_ref[:]                             # (E, M*Ks) f32
        sc_invm = scinvm_ref[:]
        sc_minv = scminv_ref[:]                         # (E, M) 1/m_sel
        scinv = scinv_ref[:]
        scinv_hi = scinv // LANE
        scinv_lo = scinv % LANE
        scinv_valid = scinv < M
    if st.has_colliders:
        cd_hi = cdhi_ref[:]
        cd_lo = cdlo_ref[:]
        cd_ok = cdok_ref[:]                             # (E, PM) f32
        cdinv = cdinv_ref[:]
        cdinv_hi = cdinv // LANE
        cdinv_lo = cdinv % LANE
        cdinv_valid = cdinv < PM

    def substep(s, carry):
        x, y, z, vx, vy, vz, ff = carry

        # ---- springs (parity: spring_forces, spring_mass.py:156) ----------
        fx = jnp.zeros_like(x)
        fy = jnp.zeros_like(x)
        fz = jnp.zeros_like(x)
        for k, o in enumerate(st.offsets):
            xj = _roll(x, -o, Np)
            yj = _roll(y, -o, Np)
            zj = _roll(z, -o, Np)
            vxj = _roll(vx, -o, Np)
            vyj = _roll(vy, -o, Np)
            vzj = _roll(vz, -o, Np)
            dx = xj - x
            dy = yj - y
            dz = zj - z
            dl = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            inv = 1.0 / jnp.maximum(dl, 1e-6)
            rest = rrest_ref[k, :][None, :]
            Yk = ry_ref[k, :][None, :]                  # 0 when inactive
            dk = rdamp_ref[k, :][None, :]               # 0 when inactive
            vrel = ((vxj - vx) * dx + (vyj - vy) * dy
                    + (vzj - vz) * dz) * inv
            mag = (Yk * (dl / rest - 1.0) + dk * vrel) * inv
            tx = mag * dx
            ty = mag * dy
            tz = mag * dz
            # both endpoints of each spring (eval_springs' add/sub pair)
            fx = fx + tx - _roll(tx, o, Np)
            fy = fy + ty - _roll(ty, o, Np)
            fz = fz + tz - _roll(tz, o, Np)

        # ---- velocity update (parity: velocity_update) ---------------------
        vx1 = (vx + fx * minv * dt) * decay
        vy1 = (vy + fy * minv * dt) * decay
        vz1 = (vz + (fz * minv + gz_const) * dt) * decay

        # ---- self-collision (parity: self_collision_slots_impulse) --------
        if st.self_collision:
            gx, gy, gz_, gvx, gvy, gvz = _gather_lanes(
                [x, y, z, vx1, vy1, vz1], sc_hi, sc_lo, n_tiles)
            xi, xj_ = gx[:, :M], gx[:, M:]
            yi, yj_ = gy[:, :M], gy[:, M:]
            zi, zj_ = gz_[:, :M], gz_[:, M:]
            vxi, vxj_ = gvx[:, :M], gvx[:, M:]
            vyi, vyj_ = gvy[:, :M], gvy[:, M:]
            vzi, vzj_ = gvz[:, :M], gvz[:, M:]

            def rep(a):  # (E, M) -> (E, M*Ks); slot lanes are slot-major
                return (jnp.concatenate([a] * Ks, axis=1) if Ks > 1 else a)

            dxs = xj_ - rep(xi)
            dys = yj_ - rep(yi)
            dzs = zj_ - rep(zi)
            dls = jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
            rvx = vxj_ - rep(vxi)
            rvy = vyj_ - rep(vyi)
            rvz = vzj_ - rep(vzi)
            dot = dxs * rvx + dys * rvy + dzs * rvz
            hit = ((sc_ok > 0.5) & (dls < opts.collision_dist)
                   & (dot < -1e-4)).astype(x.dtype)
            invn = 1.0 / jnp.maximum(dls, 1e-6)
            nxs = dxs * invn
            nys = dys * invn
            nzs = dzs * invn
            vn = rvx * nxs + rvy * nys + rvz * nzs
            scale_n = -(1.0 + elas_s) / sc_invm
            vtx = rvx - vn * nxs
            vty = rvy - vn * nys
            vtz = rvz - vn * nzs
            vtl = jnp.maximum(jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz),
                              1e-6)
            a_t = jnp.maximum(0.0, 1.0 - fric_s * (1.0 + elas_s)
                              * jnp.abs(vn) / vtl)
            scale_t = (a_t - 1.0) / sc_invm
            jx = (scale_n * vn * nxs + scale_t * vtx) * hit
            jy = (scale_n * vn * nys + scale_t * vty) * hit
            jz = (scale_n * vn * nzs + scale_t * vtz) * hit

            def slotsum(a):  # (E, M*Ks) -> (E, M)
                out = a[:, :M]
                for sidx in range(1, Ks):
                    out = out + a[:, sidx * M:(sidx + 1) * M]
                return out

            cnt = slotsum(hit)
            inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
            any_hit = (cnt > 0).astype(x.dtype)
            dvx = slotsum(jx) * inv_cnt * sc_minv * any_hit
            dvy = slotsum(jy) * inv_cnt * sc_minv * any_hit
            dvz = slotsum(jz) * inv_cnt * sc_minv * any_hit
            vxs_new = vxi - dvx
            vys_new = vyi - dvy
            vzs_new = vzi - dvz
            bx, by, bz = _gather_lanes([vxs_new, vys_new, vzs_new],
                                       scinv_hi, scinv_lo, M // LANE)
            vx1 = jnp.where(scinv_valid, bx, vx1)
            vy1 = jnp.where(scinv_valid, by, vy1)
            vz1 = jnp.where(scinv_valid, bz, vz1)

        # ---- mesh contact (parity: mesh_collision_multi) -------------------
        if st.has_colliders:
            x_adv_x = x + vx1 * dt
            x_adv_y = y + vy1 * dt
            x_adv_z = z + vz1 * dt
            cx, cy, cz, cvx, cvy, cvz = _gather_lanes(
                [x, y, z, vx1, vy1, vz1], cd_hi, cd_lo, n_tiles)
            nxx = cx + cvx * dt                       # next_x of candidates
            nxy = cy + cvy * dt
            nxz = cz + cvz * dt

            trc = trc_ref[0, pl.ds(s * EPP * C, EPP * C), :]
            rows_c = [trc[c * EPP:(c + 1) * EPP, :] for c in range(C)]

            def query(c, qx, qy, qz):
                """SDF value + world-frame unit normal of collider c."""
                rows = rows_c[c]
                lx = (rows[:, 0:1] * qx + rows[:, 1:2] * qy
                      + rows[:, 2:3] * qz + rows[:, 3:4])
                ly = (rows[:, 4:5] * qx + rows[:, 5:6] * qy
                      + rows[:, 6:7] * qz + rows[:, 7:8])
                lz = (rows[:, 8:9] * qx + rows[:, 9:10] * qy
                      + rows[:, 10:11] * qz + rows[:, 11:12])
                isp = st.inv_spacing[c]
                og = st.origin[c]
                gx = (lx - og[0]) * isp           # GLOBAL grid voxel coords
                gy = (ly - og[1]) * isp
                gz = (lz - og[2]) * isp
                ux = gx - porg_ref[0, c * 3 + 0]  # patch-local voxel coords
                uy = gy - porg_ref[0, c * 3 + 1]
                uz = gz - porg_ref[0, c * 3 + 2]
                # a query outside its patch but INSIDE the global grid is
                # served by first-order SDF extrapolation from the nearest
                # patch point along the trilinear gradient (below); only a
                # query outside the GRID gets the 1e3 no-contact sentinel,
                # matching sdf_query's outside-grid region (sdf.py:164-166)
                # exactly. Round-5: the old in-grid sentinel MISSED real
                # contacts on the violent randomization cells — projection
                # ping-pong between overlapping finger SDFs moves squeezed
                # particles several voxels per substep, no static patch
                # budget covers that, and the missed impulses diverged the
                # fused path from the scan path by up to 1.5e-1 m on
                # exactly the envs whose escape counters fired.
                hi = 3.0 - 1e-4
                esc = ((ux < 0.0) | (ux > hi) | (uy < 0.0) | (uy > hi)
                       | (uz < 0.0) | (uz > hi))
                nx_c, ny_c, nz_c = st.dims[c]
                in_grid = ((gx >= 0.0) & (gx <= nx_c - 1)
                           & (gy >= 0.0) & (gy <= ny_c - 1)
                           & (gz >= 0.0) & (gz <= nz_c - 1))
                over = jnp.maximum(jnp.maximum(
                    jnp.maximum(-ux, ux - hi), jnp.maximum(-uy, uy - hi)),
                    jnp.maximum(-uz, uz - hi))
                # telemetry: extrapolation is first-order — trustworthy for
                # a few voxels past the patch face. Count only in-grid
                # escapes beyond that radius as genuine coverage failures
                # (cross-collider candidates, selected for another collider
                # and parked miles outside this one's clamped patch, take
                # the extrapolated-to-huge or out-of-grid lane either way).
                esc_far = esc & in_grid & (over >= 6.0)
                uxc = jnp.clip(ux, 0.0, hi)
                uyc = jnp.clip(uy, 0.0, hi)
                uzc = jnp.clip(uz, 0.0, hi)
                dxv = ux - uxc            # voxels past the patch, per axis
                dyv = uy - uyc
                dzv = uz - uzc
                ux, uy, uz = uxc, uyc, uzc

                def plane(a, b, zc):
                    return pv_ref[0, c * 64 + (a * 4 + b) * 4 + zc]

                val, gxu, gyu, gzu = _patch_trilinear(plane, ux, uy, uz)
                # first-order extension of the sampled field: the patch
                # gradients are meters-per-voxel, dx/dy/dzv are voxels, so
                # this continues the trilinear surface linearly past the
                # patch face (exact on the face, conservative lower bound
                # outside box-like colliders). Out-of-grid queries keep the
                # scan path's sentinel verdict.
                val = val + dxv * gxu + dyv * gyu + dzv * gzu
                val = jnp.where(esc & ~in_grid, 1e3, val)
                # metric gradient then exact sdf_query normalization
                gxm = gxu * isp
                gym = gyu * isp
                gzm = gzu * isp
                gl = jnp.maximum(
                    jnp.sqrt(gxm * gxm + gym * gym + gzm * gzm), 1e-9)
                gxm = gxm / gl
                gym = gym / gl
                gzm = gzm / gl
                wx = (rows[:, 12:13] * gxm + rows[:, 13:14] * gym
                      + rows[:, 14:15] * gzm)
                wy = (rows[:, 15:16] * gxm + rows[:, 16:17] * gym
                      + rows[:, 17:18] * gzm)
                wz = (rows[:, 18:19] * gxm + rows[:, 19:20] * gym
                      + rows[:, 20:21] * gzm)
                return val, wx, wy, wz, esc_far

            ds_, ns_ = [], []
            esc_cnt = jnp.zeros((EPP, 1), jnp.float32)
            for c in range(C):
                val, wx, wy, wz, esc = query(c, nxx, nxy, nxz)
                ds_.append(val)
                ns_.append((wx, wy, wz))
                # telemetry: in-reach candidates whose query left the patch
                esc_cnt = esc_cnt + jnp.sum(
                    esc.astype(x.dtype) * cd_ok, axis=1, keepdims=True)
            dist = ds_[0]
            best = jnp.zeros_like(dist, dtype=jnp.int32)
            for c in range(1, C):
                better = ds_[c] < dist
                dist = jnp.where(better, ds_[c], dist)
                best = jnp.where(better, c, best)
            nx_ = ns_[0][0]
            ny_ = ns_[0][1]
            nz_ = ns_[0][2]
            for c in range(1, C):
                selc = best == c
                nx_ = jnp.where(selc, ns_[c][0], nx_)
                ny_ = jnp.where(selc, ns_[c][1], ny_)
                nz_ = jnp.where(selc, ns_[c][2], nz_)
            is_dyn = best < n_f
            finger = jnp.minimum(best, max(n_f - 1, 0))

            in_range = jnp.abs(dist) < 0.02
            margin = jnp.where(is_dyn & (not opts.use_pusher), 0.005, 0.001)
            err = dist - margin
            contact = in_range & (err < 0.0) & (cd_ok > 0.5)

            ctr = rows_c[0]                  # center rides lanes 21:24
            dynr = dyn_ref[:]
            if n_f > 1:
                fsel = (finger >= 1).astype(x.dtype)
                lvx = dynr[:, 0:1] + (dynr[:, 3:4] - dynr[:, 0:1]) * fsel
                lvy = dynr[:, 1:2] + (dynr[:, 4:5] - dynr[:, 1:2]) * fsel
                lvz = dynr[:, 2:3] + (dynr[:, 5:6] - dynr[:, 2:3]) * fsel
            else:
                one = jnp.ones_like(dist)
                lvx = dynr[:, 0:1] * one
                lvy = dynr[:, 1:2] * one
                lvz = dynr[:, 2:3] * one
            omx = dynr[:, 6:7]
            omy = dynr[:, 7:8]
            omz = dynr[:, 8:9]
            rx = cx - ctr[:, 21:22]
            rry = cy - ctr[:, 22:23]
            rz = cz - ctr[:, 23:24]
            vsx = lvx + omy * rz - omz * rry
            vsy = lvy + omz * rx - omx * rz
            vsz = lvz + omx * rry - omy * rx
            dyn_f = is_dyn.astype(x.dtype)
            vrx = cvx - vsx * dyn_f
            vry = cvy - vsy * dyn_f
            vrz = cvz - vsz * dyn_f

            el = jnp.where(is_dyn, elas_e, elas_g)
            fr = jnp.where(is_dyn, fric_e, fric_g)
            vn = vrx * nx_ + vry * ny_ + vrz * nz_
            vnx = vn * nx_
            vny = vn * ny_
            vnz = vn * nz_
            vtx = vrx - vnx
            vty = vry - vny
            vtz = vrz - vnz
            vtl = jnp.maximum(jnp.sqrt(vtx * vtx + vty * vty + vtz * vtz),
                              1e-6)
            a_t = jnp.maximum(0.0, 1.0 - fr * (1.0 + el) * jnp.abs(vn) / vtl)
            vnnx = -el * vnx
            vnny = -el * vny
            vnnz = -el * vnz
            vrsx = vnnx + a_t * vtx + vsx * dyn_f
            vrsy = vnny + a_t * vty + vsy * dyn_f
            vrsz = vnnz + a_t * vtz + vsz * dyn_f
            cf = contact.astype(x.dtype)
            cvx_new = cvx + (vrsx - cvx) * cf
            cvy_new = cvy + (vrsy - cvy) * cf
            cvz_new = cvz + (vrsz - cvz) * cf

            xsx = nxx - nx_ * err
            xsy = nxy - ny_ * err
            xsz = nxz - nz_ * err
            n2x = cx + cvx_new * dt
            n2y = cy + cvy_new * dt
            n2z = cz + cvz_new * dt
            if n_f > 0:
                d2 = g2x = g2y = g2z = None
                for c in range(n_f):
                    v2, w2x, w2y, w2z, _ = query(c, n2x, n2y, n2z)
                    if d2 is None:
                        d2, g2x, g2y, g2z = v2, w2x, w2y, w2z
                    else:
                        selc = finger == c
                        d2 = jnp.where(selc, v2, d2)
                        g2x = jnp.where(selc, w2x, g2x)
                        g2y = jnp.where(selc, w2y, g2y)
                        g2z = jnp.where(selc, w2z, g2z)
                err2 = d2 - margin
                hit2 = ((jnp.abs(d2) < 0.02) & (err2 < 0.0)).astype(x.dtype)
                xdx = n2x - g2x * err2 * hit2
                xdy = n2y - g2y * err2 * hit2
                xdz = n2z - g2z * err2 * hit2
            else:
                xdx, xdy, xdz = n2x, n2y, n2z
            dyn_b = is_dyn & contact
            sta_b = (~is_dyn) & contact
            cxo = jnp.where(dyn_b, xdx, jnp.where(sta_b, xsx, nxx))
            cyo = jnp.where(dyn_b, xdy, jnp.where(sta_b, xsy, nxy))
            czo = jnp.where(dyn_b, xdz, jnp.where(sta_b, xsz, nxz))

            # last-substep finger forces (collision forces are zeroed every
            # substep upstream, spring_mass_warp.py:900)
            fparts = []
            inv_dt = 1.0 / dt
            basem = (contact & is_dyn).astype(x.dtype)
            for f in range(max(n_f, 1)):
                mf = basem * (finger == f).astype(x.dtype)
                fparts.append(jnp.sum(mf * (vnnx - vnx) * inv_dt, axis=1,
                                      keepdims=True))
                fparts.append(jnp.sum(mf * (vnny - vny) * inv_dt, axis=1,
                                      keepdims=True))
                fparts.append(jnp.sum(mf * (vnnz - vnz) * inv_dt, axis=1,
                                      keepdims=True))
            fparts.append(jnp.zeros((EPP, 30 - 3 * max(n_f, 1)), x.dtype))
            fparts.append(ff[:, 30:31] + esc_cnt)    # patch-escape counter
            fparts.append(jnp.zeros((EPP, 1), x.dtype))
            ff = jnp.concatenate(fparts, axis=1)

            sx, sy, sz, svx, svy, svz = _gather_lanes(
                [cxo, cyo, czo, cvx_new, cvy_new, cvz_new],
                cdinv_hi, cdinv_lo, PM // LANE)
            x = jnp.where(cdinv_valid, sx, x_adv_x)
            y = jnp.where(cdinv_valid, sy, x_adv_y)
            z = jnp.where(cdinv_valid, sz, x_adv_z)
            vx1 = jnp.where(cdinv_valid, svx, vx1)
            vy1 = jnp.where(cdinv_valid, svy, vy1)
            vz1 = jnp.where(cdinv_valid, svz, vz1)

        # ---- ground (parity: ground_collision_integrate) -------------------
        nz_g = (z + vz1 * dt) * rev
        colliding = (nz_g < opts.ground_height) & (vz1 * rev < -1e-4)
        vn_g = vz1 * rev
        vnz_w = vn_g * rev
        vtx_g = vx1
        vty_g = vy1
        vtz_g = vz1 - vnz_w
        vtl_g = jnp.maximum(jnp.sqrt(vtx_g * vtx_g + vty_g * vty_g
                                     + vtz_g * vtz_g), 1e-6)
        a_g = jnp.maximum(0.0, 1.0 - fric_g * (1.0 + elas_g)
                          * jnp.abs(vn_g) / vtl_g)
        rvx_g = a_g * vtx_g
        rvy_g = a_g * vty_g
        rvz_g = -elas_g * vnz_w + a_g * vtz_g
        cg = colliding.astype(x.dtype)
        vxo = vx1 + (rvx_g - vx1) * cg
        vyo = vy1 + (rvy_g - vy1) * cg
        vzo = vz1 + (rvz_g - vz1) * cg
        toi = jnp.where(colliding, -(z - opts.ground_height) / vz1, 0.0)
        xo = x + vx1 * toi + vxo * (dt - toi)
        yo = y + vy1 * toi + vyo * (dt - toi)
        zo = z + vz1 * toi + vzo * (dt - toi)
        return xo, yo, zo, vxo, vyo, vzo, ff

    init = (x_ref[:], y_ref[:], z_ref[:], vx_ref[:], vy_ref[:], vz_ref[:],
            ffi_ref[:])
    x, y, z, vx, vy, vz, ff = jax.lax.fori_loop(0, st.K, substep, init)
    xo_ref[:] = x
    yo_ref[:] = y
    zo_ref[:] = z
    vxo_ref[:] = vx
    vyo_ref[:] = vy
    vzo_ref[:] = vz
    ff_ref[:] = ff


def _build_pallas_chunk(st: _Static, G: int, O: int, interpret: bool):
    """pallas_call wrapper for one K-substep chunk over G env groups."""
    Np, M, Ks, PM, C = st.Np, st.M, st.Ks, st.PM, st.C
    MK = M * Ks
    SC = M + MK
    B = G * EPP
    KC = st.K * EPP * C

    def sh2(cols):
        return pl.BlockSpec((EPP, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda i, _n=len(shape): (0,) * _n,
                            memory_space=pltpu.VMEM)

    def g3(shape):
        return pl.BlockSpec((1,) + shape[1:],
                            lambda i, _n=len(shape): (i,) + (0,) * (_n - 1),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # scalars (8,)
        sh2(Np), sh2(Np), sh2(Np), sh2(Np), sh2(Np), sh2(Np),  # state
        shared((1, Np)),                                       # 1/mass
        shared((O, Np)), shared((O, Np)), shared((O, Np)),     # roll tables
        sh2(SC), sh2(SC), sh2(MK), sh2(MK), sh2(M), sh2(Np),   # self-col
        sh2(PM), sh2(PM), sh2(PM), sh2(Np),                    # contact idx
        g3((G, KC, 32)),                                       # pose rows
        sh2(32),                                               # dyn vel rows
        g3((G, C * 64, EPP, PM)),                              # patches
        g3((G, C * 3, EPP, PM)),                               # patch origins
        sh2(32),                                               # ff carry in
    ]
    out_specs = [sh2(Np)] * 6 + [sh2(32)]
    out_shape = ([jax.ShapeDtypeStruct((B, Np), jnp.float32)] * 6
                 + [jax.ShapeDtypeStruct((B, 32), jnp.float32)])

    return pl.pallas_call(
        functools.partial(_kernel, st),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# XLA-side glue: per-control-step freezes + per-chunk patch rebuild
# ---------------------------------------------------------------------------


def _inverse_map(idx: jax.Array, n: int, sentinel: int) -> jax.Array:
    """inv[b, j] = position of j in idx[b], else sentinel. idx rows unique."""
    b, m = idx.shape
    inv = jnp.full((b, n), sentinel, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, m))
    return inv.at[rows, idx].set(
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (b, m)),
        mode="drop")


def _pad_ids(ids, ok, target, n_real):
    """Pad a (B, m) id selection to (B, target) with distinct padding-lane
    ids (n_real..), marked invalid. Keeps inverse maps well-defined."""
    b, m = ids.shape
    if m == target:
        return ids, ok
    extra = target - m
    pad_ids = jnp.broadcast_to(
        n_real + jnp.arange(extra, dtype=jnp.int32)[None], (b, extra))
    ids = jnp.concatenate([ids, pad_ids], axis=1)
    ok = jnp.concatenate([ok, jnp.zeros((b, extra), ok.dtype)], axis=1)
    return ids, ok


def make_pallas_step_fn(opts: PhysicsOptions, params: SpringMassParams,
                        colliders: MeshColliderSet | None, batch: int,
                        interpret: bool = False, max_chunk: int = 32):
    """Build the fused batched control step.

    Returns ``step(params, static_pose, rest_x, state, ctrl) -> state`` on
    stacked (B, ...) state/ctrl leaves with SHARED spring tables and
    collider geometry; per-env variation enters via ``static_pose``
    (B, S, 4, 4), ``rest_x`` (B, N, 3) and the ctrl/state leaves. Semantics
    match make_step_fn vmapped over envs (tests/test_pallas_step.py).
    """
    assert supports_pallas(opts, params), "pallas step: unsupported config"
    has_colliders = colliders is not None and (
        len(colliders.fingers) + len(colliders.statics) > 0)

    # ---- build-time constants (one host sync) -----------------------------
    offsets_all = np.asarray(params.roll_offsets)
    pos_rows = np.where(offsets_all > 0)[0]
    offsets = tuple(int(o) for o in offsets_all[pos_rows])
    O = max(len(offsets), 1)
    N = int(params.masses.shape[0])
    Np = _ceil_to(max(N, LANE), LANE)
    B = batch
    Bp = _ceil_to(max(B, EPP), EPP)
    G = Bp // EPP
    M = min(opts.max_self_particles, Np)
    Ks = min(opts.max_self_slots, min(opts.max_candidates, N))
    PM = min(opts.max_contact_particles, Np)
    K, n_full, rem = best_chunk(opts.num_substeps, max_chunk)

    grids: list[SdfGrid] = (list(colliders.fingers) + list(colliders.statics)
                            if has_colliders else [])
    C = max(len(grids), 1)
    n_f = len(colliders.fingers) if has_colliders else 0

    inv_sp = tuple(float(np.asarray(g.inv_spacing)) for g in grids) or (1.0,)
    origin = tuple(tuple(float(v) for v in np.asarray(g.origin))
                   for g in grids) or ((0.0, 0.0, 0.0),)
    if has_colliders:
        b4_list, b4_dims_l, b4_off_l = [], [], [0]
        dims_true = []
        for g in grids:
            blk = (np.asarray(g.blocks4) if g.blocks4 is not None
                   else pack_blocks4(np.asarray(g.values)))
            b4_list.append(blk)
            b4_dims_l.append(blocks4_dims(g.values.shape))
            dims_true.append(tuple(g.values.shape))
            b4_off_l.append(b4_off_l[-1] + blk.shape[0])
        b4 = jnp.asarray(np.concatenate(b4_list, axis=0))
        b4_dims = np.asarray(b4_dims_l)
        b4_off = np.asarray(b4_off_l[:-1])
        dims_true = np.asarray(dims_true)
        grid_origin = jnp.asarray(origin, jnp.float32)         # (C, 3)
        grid_isp = jnp.asarray(inv_sp, jnp.float32)            # (C,)

    dims_st = (tuple(tuple(int(v) for v in d) for d in dims_true)
               if has_colliders else ((2, 2, 2),))

    def mk_static(k):
        return _Static(opts=opts, K=k, Np=Np, offsets=offsets, n_f=n_f, C=C,
                       inv_spacing=inv_sp, origin=origin, dims=dims_st,
                       M=M, Ks=Ks, PM=PM,
                       has_colliders=has_colliders,
                       self_collision=bool(opts.self_collision))

    chunk_call = _build_pallas_chunk(mk_static(K), G, O, interpret)
    chunk_call_rem = (_build_pallas_chunk(mk_static(rem), G, O, interpret)
                      if rem else None)

    pad_lane = Np - N
    pad_env = Bp - B

    def _padB(a):
        if pad_env == 0:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad_env,) + a.shape[1:])], axis=0)

    def step(params: SpringMassParams, static_pose, rest_x,
             state: SpringMassState, ctrl: SubstepControls) -> SpringMassState:
        # ---- RCM boundary permutation (roll tables index internal order) --
        # x/v (and batched rest_x) pack into ONE row gather per boundary:
        # TPU gathers serialize per row, so k separate fancy-index gathers
        # by the same perm cost ~k-x one packed wide-row gather
        perm = params.roll_perm
        if perm is not None:
            params = params.replace(
                masses=params.masses[perm],
                collision_mask=params.collision_mask[perm])
            if rest_x.ndim == 3:
                xvr = jnp.concatenate([state.x, state.v, rest_x],
                                      axis=-1)[:, perm]
                rest_x = xvr[..., 6:9]
            else:
                xvr = jnp.concatenate([state.x, state.v], axis=-1)[:, perm]
                rest_x = rest_x[perm]          # shared (N, 3): cheap
            state = state.replace(x=xvr[..., 0:3], v=xvr[..., 3:6])

        # ---- shared tables (constant per episode; folded by XLA) ----------
        Y = jnp.exp(params.roll_Y_log)
        active = Y > opts.spring_Y_min
        Yc = jnp.where(active,
                       jnp.clip(Y, opts.spring_Y_min, opts.spring_Y_max), 0.0)
        damp = jnp.where(active, opts.dashpot_damping, 0.0)
        padw = ((0, 0), (0, pad_lane))
        if len(offsets):
            rrest = jnp.pad(params.roll_rest[pos_rows], padw,
                            constant_values=1.0)
            ryt = jnp.pad(Yc[pos_rows], padw)
            rdamp = jnp.pad(damp[pos_rows], padw)
        else:
            rrest = jnp.ones((1, Np))
            ryt = jnp.zeros((1, Np))
            rdamp = jnp.zeros((1, Np))
        minv_full = 1.0 / params.masses
        minv = jnp.pad(minv_full, (0, pad_lane), constant_values=1.0)[None]
        scal = jnp.stack([
            jnp.clip(params.collide_elas, 0.0, 1.0),
            jnp.clip(params.collide_fric, 0.0, 2.0),
            jnp.clip(params.collide_eef_elas, 0.0, 1.0),
            jnp.clip(params.collide_eef_fric, 0.0, 2.0),
            jnp.clip(params.collide_self_elas, 0.0, 1.0),
            jnp.clip(params.collide_self_fric, 0.0, 2.0),
            jnp.exp(jnp.asarray(-opts.dt * opts.drag_damping, jnp.float32)),
            jnp.zeros(())]).astype(jnp.float32)

        # ---- state to lane layout ------------------------------------------
        xb = _padB(state.x)                              # (Bp, N, 3)
        vb = _padB(state.v)
        restb = _padB(rest_x if rest_x.ndim == 3
                      else jnp.broadcast_to(rest_x[None], (B,) + rest_x.shape))
        ctrl_p = jax.tree_util.tree_map(_padB, ctrl)
        coords = [jnp.pad(xb[..., i], ((0, 0), (0, pad_lane)))
                  for i in range(3)]
        vels = [jnp.pad(vb[..., i], ((0, 0), (0, pad_lane)))
                for i in range(3)]

        # ---- per-control-step freezes (same fns as the XLA scan path) -----
        tele = jnp.zeros((Bp, 4), jnp.int32)
        if opts.self_collision:
            def freeze_one(x_e, rest_e):
                p_e = params.replace(rest_x=rest_e)
                return build_candidate_slots(p_e, opts, x_e)
            sel, sidx, sok, n_drop_c, n_drop_p = jax.vmap(freeze_one)(
                xb, restb)
            tele = tele.at[:, 0].set(n_drop_c).at[:, 1].set(n_drop_p)
            sel, sel_ok = _pad_ids(sel, jnp.ones(sel.shape, bool), M, N)
            kp = sidx.shape[-1]
            if kp < Ks:
                sidx = jnp.pad(sidx, ((0, 0), (0, 0), (0, Ks - kp)))
                sok = jnp.pad(sok, ((0, 0), (0, 0), (0, Ks - kp)))
            mpad = M - sidx.shape[1]
            if mpad:
                sidx = jnp.pad(sidx, ((0, 0), (0, mpad), (0, 0)))
                sok = jnp.pad(sok, ((0, 0), (0, mpad), (0, 0)))
            sok = sok & sel_ok[:, :, None]
            sidx_sm = jnp.swapaxes(sidx, 1, 2).reshape(Bp, M * Ks)
            sok_sm = jnp.swapaxes(sok, 1, 2).reshape(Bp, M * Ks)
            gidx = jnp.concatenate([sel, sidx_sm], axis=1)
            sc_hi = (gidx // LANE).astype(jnp.int32)
            sc_lo = (gidx % LANE).astype(jnp.int32)
            mi = jnp.take(minv_full, jnp.minimum(sel, N - 1), axis=0)
            mj = jnp.take(minv_full, jnp.minimum(sidx_sm, N - 1), axis=0)
            sc_invm = jnp.tile(mi, (1, Ks)) + mj
            sc_minv = mi
            sc_inv = _inverse_map(sel, Np, M)
        else:
            sc_hi = sc_lo = jnp.zeros((Bp, M + M * Ks), jnp.int32)
            sok_sm = jnp.zeros((Bp, M * Ks), bool)
            sc_invm = jnp.ones((Bp, M * Ks), jnp.float32)
            sc_minv = jnp.ones((Bp, M), jnp.float32)
            sc_inv = jnp.full((Bp, Np), M, jnp.int32)

        if has_colliders:
            cset = colliders
            sp = static_pose
            if sp.ndim == 3:
                sp = jnp.broadcast_to(sp[None], (B,) + sp.shape)
            sp = _padB(sp)

            def pose_one(ctrl_e, sp_e):
                return _substep_pose_tables(
                    opts, cset.replace(static_pose=sp_e), ctrl_e, jnp.float32)
            T_all, Tinv_all, centers = jax.vmap(pose_one)(ctrl_p, sp)

            combo_meta = {"dims": dims_true, "inv_spacing": grid_isp,
                          "origin": grid_origin}

            def cand_one(x_e, v_e, T_all_e):
                return select_contact_particles(opts, combo_meta, x_e, v_e,
                                                T_all_e)
            cand, cand_ok, n_drop_ct = jax.vmap(cand_one)(xb, vb, T_all)
            tele = tele.at[:, 2].set(n_drop_ct)
            cand, cand_ok = _pad_ids(cand, cand_ok, PM, N)
            cd_hi = (cand // LANE).astype(jnp.int32)
            cd_lo = (cand % LANE).astype(jnp.int32)
            cd_inv = _inverse_map(cand, Np, PM)

            # pose rows: chunk-block row = s*(EPP*C) + c*EPP + e
            tinv_flat = Tinv_all[..., :3, :4].reshape(
                Bp, opts.num_substeps, C, 12)
            rot_flat = T_all[..., :3, :3].reshape(
                Bp, opts.num_substeps, C, 9)
            ctr_flat = jnp.broadcast_to(
                centers[:, :, None, :], centers.shape[:2] + (C, 3))
            trc = jnp.concatenate(
                [tinv_flat, rot_flat, ctr_flat,
                 jnp.zeros(tinv_flat.shape[:-1] + (8,), jnp.float32)],
                axis=-1)
            trc = jnp.transpose(trc, (1, 2, 0, 3)).reshape(
                opts.num_substeps, C, G, EPP, 32)
            trc = jnp.transpose(trc, (2, 0, 1, 3, 4)).reshape(
                G, opts.num_substeps * C * EPP, 32)

            lin = _padB(ctrl.dyn_lin_vel).reshape(Bp, -1)
            if lin.shape[1] < 6:
                lin = jnp.pad(lin, ((0, 0), (0, 6 - lin.shape[1])))
            dyn_rows = jnp.concatenate(
                [lin[:, :6], _padB(ctrl.dyn_omega),
                 jnp.zeros((Bp, 23), jnp.float32)], axis=1)
        else:
            cand = jnp.zeros((Bp, PM), jnp.int32)
            cand_ok = jnp.zeros((Bp, PM), bool)
            cd_hi = cd_lo = jnp.zeros((Bp, PM), jnp.int32)
            cd_inv = jnp.full((Bp, Np), PM, jnp.int32)
            trc = jnp.zeros((G, opts.num_substeps * C * EPP, 32), jnp.float32)
            dyn_rows = jnp.zeros((Bp, 32), jnp.float32)

        def build_patches(xs, ys, zs, vxs, vys, vzs, k, s0):
            """4^3 SDF patches centered on the PREDICTED mid-chunk candidate
            positions (the TPU-side replacement for per-substep BVH queries;
            one gathered row per (particle, collider)).

            Centering on x + v*(k*dt/2) instead of the chunk-start position
            doubles the directed-travel budget before a query escapes its
            patch (the patch_escapes telemetry lane): a particle moving
            ballistically stays centered instead of drifting toward the
            +2-voxel edge. The local-frame transform likewise uses the
            MID-chunk collider pose, not the chunk-start one — the patch
            lives in the collider's LOCAL frame, so a sweeping finger
            (velocity-control mimic) drifts every candidate's local coords
            by v_collider * k * dt over the chunk; centering halves that
            drift exactly like the particle-side midpoint does (round-5:
            chunk-start poses left patch_escapes ~3.3k/env on the envs the
            randomization grid parks under the sweep). Bitwise-neutral
            when no escape occurs — trilinear interpolation reads the same
            global grid cells regardless of which containing patch serves
            them."""
            half_h = 0.5 * k * opts.dt
            # travel clip (round 5): particles in ACTIVE contact carry
            # violently oscillating velocities (the impulse flips v every
            # substep) while their positions stay pinned at the surface —
            # an unclipped x + v*h/2 predictor flings their patch out of
            # the grid and every in-grid query of the chunk then escapes
            # (probe: 4.7k in-grid escapes/12 steps on the grasp cells).
            # Clip the predicted travel to HALF the patch's 1.5-voxel
            # margin: a clip equal to the full margin parks a stuck
            # particle exactly at its patch edge (chunk-start escapes
            # read 0 but every later substep's jitter escapes — the
            # constant ~5/substep signal on the grasp cells). At 0.75
            # voxels the wrong-way worst case keeps 0.75 voxels of true
            # margin, and sustained motion is covered to 2.25 voxels per
            # chunk (~5 m/s at 2.5 mm voxels, far above robot speeds).
            # Bitwise-neutral whenever no escape occurs (the patch
            # center only selects WHICH patch serves the same global
            # cells).
            lim = 0.75 / float(max(inv_sp))
            half_hc = jnp.float32(half_h)
            cxs = (jnp.take_along_axis(xs, cand, axis=1)
                   + jnp.clip(jnp.take_along_axis(vxs, cand, axis=1)
                              * half_hc, -lim, lim))
            cys = (jnp.take_along_axis(ys, cand, axis=1)
                   + jnp.clip(jnp.take_along_axis(vys, cand, axis=1)
                              * half_hc, -lim, lim))
            czs = (jnp.take_along_axis(zs, cand, axis=1)
                   + jnp.clip(jnp.take_along_axis(vzs, cand, axis=1)
                              * half_hc, -lim, lim))
            s_mid = jnp.minimum(s0 + k // 2, opts.num_substeps - 1)
            Tinv0 = jax.lax.dynamic_slice_in_dim(
                Tinv_all, s_mid, 1, axis=1)[:, 0]             # (Bp, C, 4, 4)
            p = jnp.stack([cxs, cys, czs], axis=-1)           # (Bp, PM, 3)
            # highest: at TPU default matmul precision the MXU rounds
            # the ~0.5 m positions to bf16 (~2 mm) — larger than the
            # 1-5 mm contact margins the SDF samples feed
            ploc = (jnp.einsum("bcij,bpj->bcpi", Tinv0[..., :3, :3], p,
                               precision="highest")
                    + Tinv0[:, :, None, :3, 3])
            u = ((ploc - grid_origin[None, :, None])
                 * grid_isp[None, :, None, None])
            hi_dim = jnp.asarray(b4_dims - 4, jnp.int32)
            o = jnp.clip(jnp.floor(u).astype(jnp.int32) - 1, 0,
                         hi_dim[None, :, None])
            ny3 = jnp.asarray(b4_dims[:, 1] - 3, jnp.int32)
            nz3 = jnp.asarray(b4_dims[:, 2] - 3, jnp.int32)
            bidx = ((o[..., 0] * ny3[None, :, None] + o[..., 1])
                    * nz3[None, :, None] + o[..., 2]
                    + jnp.asarray(b4_off, jnp.int32)[None, :, None])
            pv = b4[bidx]                                     # (Bp, C, PM, 64)
            pv = jnp.transpose(pv, (1, 3, 0, 2)).reshape(
                C * 64, G, EPP, PM)
            pv = jnp.transpose(pv, (1, 0, 2, 3))
            og = jnp.transpose(o.astype(jnp.float32), (1, 3, 0, 2)).reshape(
                C * 3, G, EPP, PM)
            og = jnp.transpose(og, (1, 0, 2, 3))
            return pv, og

        def run_chunk(call, k, carry, s0):
            xs, ys, zs, vxs, vys, vzs, ff = carry
            if has_colliders:
                pv, og = build_patches(xs, ys, zs, vxs, vys, vzs, k, s0)
                trc_c = jax.lax.dynamic_slice_in_dim(
                    trc, s0 * C * EPP, k * C * EPP, axis=1)
            else:
                pv = jnp.zeros((G, C * 64, EPP, PM), jnp.float32)
                og = jnp.zeros((G, C * 3, EPP, PM), jnp.float32)
                trc_c = jnp.zeros((G, k * C * EPP, 32), jnp.float32)
            outs = call(scal, xs, ys, zs, vxs, vys, vzs,
                        minv, rrest, ryt, rdamp,
                        sc_hi, sc_lo, sok_sm.astype(jnp.float32),
                        sc_invm, sc_minv, sc_inv,
                        cd_hi, cd_lo, cand_ok.astype(jnp.float32),
                        cd_inv, trc_c, dyn_rows, pv, og, ff)
            return tuple(outs)

        ff0 = jnp.zeros((Bp, 32), jnp.float32)
        carry = tuple(coords) + tuple(vels) + (ff0,)
        carry, _ = jax.lax.scan(
            lambda c, ci: (run_chunk(chunk_call, K, c, ci * K), None),
            carry, jnp.arange(n_full, dtype=jnp.int32))
        if rem:
            carry = run_chunk(chunk_call_rem, rem, carry,
                              jnp.asarray(n_full * K, jnp.int32))
        xs, ys, zs, vxs, vys, vzs, ff = carry

        xv_out = jnp.stack([xs[:B, :N], ys[:B, :N], zs[:B, :N],
                            vxs[:B, :N], vys[:B, :N], vzs[:B, :N]], axis=-1)
        if perm is not None:      # one packed inverse gather (see entry)
            xv_out = xv_out[:, params.roll_inv_perm]
        x_out = xv_out[..., 0:3]
        v_out = xv_out[..., 3:6]
        nf_out = state.finger_forces.shape[-2]
        ff_out = ff[:B, :3 * nf_out].reshape(B, nf_out, 3)
        # patch escapes accumulate in ff lane 30 inside the kernel
        tele_out = tele.at[:, 3].set(ff[:Bp, 30].astype(jnp.int32))[:B]
        return SpringMassState(x=x_out, v=v_out, finger_forces=ff_out,
                               telemetry=tele_out)

    return step
