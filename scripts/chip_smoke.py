"""Chip smoke — fast TPU evidence banker (VERDICT round-3 item 2).

Runs every Pallas kernel family once on the REAL chip at small shapes,
cross-checks pixels / trajectories against the dense XLA reference
implementations, takes a quick multi-iteration timing, and APPENDS one
timestamped JSON line per kernel to ``CHIP_LOG.jsonl`` at the repo root.

Run this after every chip-validated optimization, not once at round end:
a mid-round tunnel death then still leaves the last optimization's
hardware numbers on disk (round 3 lost its entire A/B to exactly that
failure mode).

Usage (tunnel up, default axon platform):
    python scripts/chip_smoke.py [--items wide,fine,...] [--note "msg"]

Items: wide, fine, incr_wide, incr_fine, diff, physics.
Never raises — failures are recorded as ok=false with the exception.
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
LOG = REPO / "CHIP_LOG.jsonl"

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402
import numpy as np                                             # noqa: E402

# persistent compile cache: smoke reruns after a code change only pay for
# the kernels whose HLO actually changed
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bank(item: str, ok: bool, detail: str, ms=None, note: str = ""):
    rec = {"ts": datetime.datetime.now().isoformat(timespec="seconds"),
           "item": item, "ok": bool(ok), "detail": detail,
           "backend": jax.default_backend()}
    if ms is not None:
        rec["ms"] = round(float(ms), 3)
    if note:
        rec["note"] = note
    with LOG.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def time_ms(fn, iters=5):
    """Steady-state per-iteration ms (VERDICT round-4 weak 6: a single
    warmup did not reliably absorb the tunnel's remote-compile cost —
    cold-cache smoke runs still banked seconds-scale `ms` for the same
    kernel that times ~13 ms warm). Two timed loops, each ended by a
    true device_get sync; the SECOND loop is by construction past every
    compile/autotune path, and is what gets banked."""
    sync(fn())                      # warmup / compile
    per_iter = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        sync(r)
        per_iter.append((time.perf_counter() - t0) / iters * 1e3)
    return per_iter[-1]


# ---------------------------------------------------------------------------
# shared scene fixtures
# ---------------------------------------------------------------------------


def rand_gaussians(rng, n, center=(0.0, 0.0, 1.5), spread=0.5, scale=0.02):
    means = (np.asarray(center)
             + rng.normal(scale=spread, size=(n, 3))).astype(np.float32)
    means[:, 2] = np.abs(means[:, 2]) + 0.3
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return {
        "means3D": jnp.asarray(means),
        "scales": jnp.asarray(
            rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32) * scale),
        "rotations": jnp.asarray(quats),
        "opacities": jnp.asarray(
            rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        "shs": jnp.asarray(
            rng.normal(scale=0.3, size=(n, 1, 3)).astype(np.float32)),
    }


def smoke_cam(w=424, h=240):
    from real2sim_eval_tpu.renderer.camera import Camera

    return Camera(width=w, height=h, fx=260.0, fy=260.0, cx=w / 2, cy=h / 2,
                  z_threshold=0.05)


def pixel_diff(rgb_p, rgb_r, dep_p, dep_r):
    d_rgb = float(jnp.abs(jnp.clip(rgb_p, 0, 1)
                          - jnp.clip(rgb_r, 0, 1)).max())
    flips = int((np.abs(np.asarray(dep_p) - np.asarray(dep_r))
                 > 1e-2).sum())
    return d_rgb, flips


# ---------------------------------------------------------------------------
# smoke items
# ---------------------------------------------------------------------------


def smoke_full(kernel: str, note: str):
    """Full batched pipeline (preprocess+binning+sort+compositor) vs the
    dense reference, one camera, N=4000.  Budgets are calibrated like the
    evaluator's (measure_and_plan) — the pixel check is only meaningful
    with drops=0, and drops are reported either way."""
    from real2sim_eval_tpu.renderer import RasterConfig
    from real2sim_eval_tpu.renderer import calibrate as cal
    from real2sim_eval_tpu.renderer.raster import rasterize, rasterize_batch

    rng = np.random.default_rng(7)
    sc = rand_gaussians(rng, 4000)
    cam = smoke_cam()
    w2c = jnp.eye(4)
    base = RasterConfig(backend="pallas", kernel=kernel)
    one = {k: v[None] for k, v in sc.items()}
    cams = [(cam, w2c[None])]
    cfg = cal.measure_and_plan(base, cams, one, 0,
                               one["means3D"].shape[1], base.chunk)

    def run(return_drops=False):
        return rasterize_batch(cams, one, 0, config=cfg,
                               return_drops=return_drops)

    rgb_p, dep_p, drops = run(return_drops=True)
    n_drop = int(np.asarray(drops).sum())
    rgb_r, dep_r = rasterize(cam, w2c, sc["means3D"], sc["scales"],
                             sc["rotations"], sc["opacities"], sc["shs"], 0,
                             config=RasterConfig(backend="reference"))
    d_rgb, flips = pixel_diff(rgb_p[0, 0], rgb_r, dep_p[0, 0], dep_r)
    # flip tolerance 1e-3 (vs bench's 2e-4): the smoke scene is a dense
    # random cloud with far more near-equal-depth T=0.5 ties than the
    # bench scene, and production packs f16 sort payloads (PARITY dev 16)
    ok = (d_rgb < 2e-2 and flips <= max(5, int(1e-3 * dep_r.size))
          and n_drop == 0)
    # jit once for the timing: a bare rasterize_batch call re-traces every
    # invocation, which measures tracing overhead, not the kernel
    runj = jax.jit(lambda: run()[0])
    ms = time_ms(runj)
    bank(kernel, ok, f"max|rgb|={d_rgb:.2e} depth_flips={flips} "
         f"drops={n_drop} (4000g, 424x240)", ms, note)


def smoke_incremental(kind: str, note: str):
    from real2sim_eval_tpu.renderer import RasterConfig
    from real2sim_eval_tpu.renderer.raster import rasterize_batch

    if kind == "fine":
        from real2sim_eval_tpu.renderer.incremental_fine import (
            build_static_raster_fine as build, render_incremental_fine
            as render)
    else:
        from real2sim_eval_tpu.renderer.incremental import (
            build_static_raster as build, render_incremental as render)
    rng = np.random.default_rng(11)
    cam = smoke_cam()
    w2c = np.eye(4, dtype=np.float32)
    static = rand_gaussians(rng, 2000)
    B = 2
    dyn1 = rand_gaussians(rng, 120, center=(0.0, 0.0, 1.0), spread=0.08)
    dyn = {k: jnp.stack([v] * B) for k, v in dyn1.items()}
    dyn["means3D"] = dyn["means3D"] + jnp.asarray(
        [[0.0, 0.0, 0.0], [-0.1, 0.15, 0.0]], jnp.float32)[:, None]
    base = RasterConfig(backend="pallas", pack_payloads=False,
                        kernel="fine" if kind == "fine" else "wide")
    from real2sim_eval_tpu.renderer import calibrate as cal
    comb = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(static[k][None],
                                  (B,) + static[k].shape)], axis=1)
        for k in static}
    cfg = cal.measure_and_plan(
        base, [(cam, jnp.broadcast_to(jnp.asarray(w2c)[None], (B, 4, 4)))],
        comb, 0, comb["means3D"].shape[1], base.chunk)
    st = build(cam, w2c, static, 0, cfg)

    def run():
        return render([(cam, st, w2c)], dyn, 0, cfg)

    rgb_i, dep_i, _tele = run()
    rgb_f, dep_f = rasterize_batch(
        [(cam, jnp.broadcast_to(jnp.asarray(w2c)[None], (B, 4, 4)))],
        comb, 0, config=cfg)
    runj = jax.jit(lambda: run()[0])
    d_rgb = float(jnp.abs(rgb_i - rgb_f).max())
    d_dep = float(jnp.abs(dep_i - dep_f).max())
    ok = d_rgb < 2e-2 and d_dep < 1e-2
    ms = time_ms(runj)
    bank(f"incr_{kind}", ok, f"max|rgb|={d_rgb:.2e} max|dep|={d_dep:.2e} "
         f"(2000 static + 120 dyn x{B})", ms, note)


def smoke_diff(note: str):
    """diff.py forward vs dense + hand-derived backward vs jax.grad of the
    dense compositor — first-chip-execution guard for the custom VJP."""
    from real2sim_eval_tpu.renderer.diff import rasterize_diff
    from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians
    from real2sim_eval_tpu.renderer.raster import (RasterConfig, TILE_W,
                                                   _composite_reference)
    from real2sim_eval_tpu.renderer.camera import Camera

    rng = np.random.default_rng(13)
    cam = Camera(width=256, height=64, fx=60.0, fy=60.0, cx=128, cy=32,
                 z_threshold=0.05)
    n = 80
    means = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.0, 3.0, n)
    scales = rng.uniform(0.02, 0.10, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, n).astype(np.float32)
    shs = (rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32)
    scene = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    w2c = jnp.eye(4)
    bg = (0.1, 0.2, 0.3)
    cfg = RasterConfig()
    wr = jnp.asarray(rng.normal(size=(3, cam.height, cam.width)),
                     jnp.float32)

    def loss_p(op):
        rgb, _ = rasterize_diff(cam, w2c, scene[0], scene[1], scene[2],
                                op, scene[4], 0, bg=bg, config=cfg)
        return jnp.sum(rgb * wr)

    def loss_d(op):
        pre = preprocess_gaussians(cam, w2c, scene[0], scene[1], scene[2],
                                   op, scene[4], 0)
        rgb, _ = _composite_reference(cam, pre, jnp.asarray(bg, jnp.float32),
                                      bin_w=TILE_W)
        return jnp.sum(rgb * wr)

    rgb_p, _ = rasterize_diff(cam, w2c, *scene, 0, bg=bg, config=cfg)
    pre = preprocess_gaussians(cam, w2c, *scene, 0)
    rgb_d, _ = _composite_reference(cam, pre, jnp.asarray(bg, jnp.float32),
                                    bin_w=TILE_W)
    d_fwd = float(jnp.abs(rgb_p - rgb_d).max())
    grad_p = jax.jit(jax.grad(loss_p))      # one wrapper: time_ms must hit
    g_p = grad_p(scene[3])                  # its warm cache, not re-trace
    g_d = jax.jit(jax.grad(loss_d))(scene[3])
    d_g = float(jnp.abs(g_p - g_d).max())
    rel = d_g / max(float(jnp.abs(g_d).max()), 1e-6)
    ok = d_fwd < 1e-3 and rel < 1e-2
    ms = time_ms(lambda: grad_p(scene[3]))
    bank("diff", ok, f"fwd max|rgb|={d_fwd:.2e} grad rel={rel:.2e} "
         f"(80g fwd+bwd)", ms, note)


def smoke_physics(note: str):
    """Fused Pallas K-substep kernel vs the XLA scan path, B=4 x 58
    substeps on a 40-particle rope (self-collision on)."""
    from real2sim_eval_tpu.physics import pallas_step
    from real2sim_eval_tpu.physics.spring_mass import (
        PhysicsOptions, SpringMassState, SubstepControls, make_step_fn)
    from real2sim_eval_tpu.physics.topology import (build_neighbor_tables,
                                                    build_rolled_tables,
                                                    connect_springs)
    from real2sim_eval_tpu.physics.spring_mass import SpringMassParams

    rng = np.random.default_rng(0)
    n, B = 40, 4
    t = np.linspace(0, 0.4, n)
    rest = np.stack([t, np.zeros(n), np.full(n, 0.05)], -1)
    rest = (rest + rng.normal(scale=1e-3, size=rest.shape)).astype(np.float32)
    springs, rl = connect_springs(rest, radius=0.035, max_neighbours=6)
    y_log = np.full(len(springs), np.log(2e3), np.float32)
    nbr = build_neighbor_tables(springs, rl, y_log, n)
    rolled = build_rolled_tables(springs, rl, y_log, n)
    params = SpringMassParams(
        springs=jnp.asarray(springs), rest_lengths=jnp.asarray(rl),
        spring_Y_log=jnp.asarray(y_log), masses=jnp.ones((n,), jnp.float32),
        nbr_idx=jnp.asarray(nbr[0]), nbr_rest=jnp.asarray(nbr[1]),
        nbr_Y_log=jnp.asarray(nbr[2]),
        collision_mask=jnp.arange(n, dtype=jnp.int32),
        rest_x=jnp.asarray(rest),
        collide_elas=jnp.asarray(0.5), collide_fric=jnp.asarray(0.3),
        collide_eef_elas=jnp.asarray(0.0),
        collide_eef_fric=jnp.asarray(1.0),
        collide_self_elas=jnp.asarray(0.5),
        collide_self_fric=jnp.asarray(0.3),
        roll_rest=jnp.asarray(rolled[1]), roll_Y_log=jnp.asarray(rolled[2]),
        roll_offsets=tuple(int(o) for o in rolled[0]))
    opts = PhysicsOptions(num_substeps=58, self_collision=True, n_fingers=0,
                          max_candidates=8, max_self_particles=128,
                          max_contact_particles=128, max_self_slots=4)
    one = SubstepControls(
        eef_xyz=jnp.asarray([0.1, 0.0, 0.2], jnp.float32),
        eef_vel=jnp.zeros(3), eef_rot=jnp.eye(3), eef_rot_vel=jnp.zeros(3),
        openness_start=jnp.asarray(1.0), openness_end=jnp.asarray(1.0),
        dyn_lin_vel=jnp.zeros((1, 3)), dyn_omega=jnp.zeros(3))
    ctrl = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), one)
    state = SpringMassState(
        x=jnp.broadcast_to(jnp.asarray(rest)[None], (B, n, 3)),
        v=jnp.zeros((B, n, 3), jnp.float32),
        finger_forces=jnp.zeros((B, 1, 3), jnp.float32))
    rest_b = jnp.broadcast_to(params.rest_x[None], (B, n, 3))

    step_ref = make_step_fn(opts, has_colliders=False)

    def one_env(rest_e, sm_e, ctrl_e):
        return step_ref(params.replace(rest_x=rest_e), None, sm_e, ctrl_e)

    ref = jax.jit(lambda sm: jax.vmap(one_env)(rest_b, sm, ctrl))
    pal = pallas_step.make_pallas_step_fn(opts, params, None, batch=B,
                                          interpret=False)
    pal_j = jax.jit(lambda sm: pal(params, None, rest_b, sm, ctrl))
    sx = ref(state)
    sp = pal_j(state)
    d_x = float(jnp.abs(sp.x - sx.x).max())
    ok = d_x < 3e-5
    ms = time_ms(lambda: pal_j(state).x)
    bank("physics", ok, f"max|x diff|={d_x:.2e} "
         f"(B=4, 40p, 58 substeps, self-coll)", ms, note)


ITEMS = {
    "wide": lambda note: smoke_full("wide", note),
    "fine": lambda note: smoke_full("fine", note),
    "incr_wide": lambda note: smoke_incremental("wide", note),
    "incr_fine": lambda note: smoke_incremental("fine", note),
    "diff": smoke_diff,
    "physics": smoke_physics,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", default=",".join(ITEMS))
    ap.add_argument("--note", default="")
    args = ap.parse_args()
    any_fail = False
    for item in args.items.split(","):
        item = item.strip()
        if not item:
            continue
        try:
            ITEMS[item](args.note)
        except Exception:
            any_fail = True
            bank(item, False,
                 "EXC: " + traceback.format_exc(limit=4).replace("\n", " | "),
                 note=args.note)
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
