"""Benchmark: combined physics-step + splat-render throughput, flagship config.

The honest north-star configuration (BASELINE.md / VERDICT round-1 item 3):
64 lockstep environments, each control step = 667 physics substeps
(self-collision + SDF contacts, 30 Hz) followed by the reference's full
observation render — 2 fixed cameras + 1 wrist camera at 848x480
(reference: sim/envs/env.py:53-74, cfg/env/xarm_gripper.yaml:22-49).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = per-env FPS / 60 (the "60 FPS per env at 64 envs" target).

Flags (for component sweeps; the driver runs the default config):
  --batch N     number of lockstep envs (default 64)
  --steps N     timed steps (default 5)
  --check       TPU-gated golden-pixel check of the compiled Pallas
                compositor against the dense reference backend
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TARGET_FPS = 60.0
CAMERAS = [
    dict(type="side", h=480, w=848,
         intr=[427.3, 0.0, 430.0, 0.0, 426.8, 242.8, 0.0, 0.0, 1.0],
         c2w=[0.005, 0.613, -0.790, 0.883,
              1.0, -0.004, 0.004, 0.054,
              -0.001, -0.790, -0.613, 0.398,
              0.0, 0.0, 0.0, 1.0]),
    dict(type="side", h=480, w=848,
         intr=[427.3, 0.0, 430.0, 0.0, 426.8, 242.8, 0.0, 0.0, 1.0],
         c2w=[-0.707, 0.433, -0.559, 0.70,
              0.707, 0.433, -0.559, -0.45,
              0.0, -0.790, -0.613, 0.398,
              0.0, 0.0, 0.0, 1.0]),
    dict(type="wrist", h=480, w=848,
         intr=[427.3, 0.0, 430.0, 0.0, 426.8, 242.8, 0.0, 0.0, 1.0],
         c2w=[-0.006, -1.0, -0.024, 0.07,
              1.0, -0.006, -0.010, -0.006,
              0.010, -0.024, 1.0, 0.031,
              0.0, 0.0, 0.0, 1.0]),
]


KERNEL = "wide"
WRIST_KERNEL = "inherit"
MERGE_KERNEL = "sort"     # incremental merge variant (RasterConfig)
# render-honest scene sizes (VERDICT round-2 item 4): the reference's
# scans LBS ~100k+ gaussians (sim/renderer/gs_renderer.py:729-757), so the
# headline number comes from the ~100k scene; the ~31k scene is reported
# alongside for continuity with rounds 1-2
N_TABLE_SMALL = 30000
N_TABLE_BIG = 99000
# headline dynamic load (VERDICT round-3 weak 3): the LBS'd object is
# reference-scan-scale — 30k body splats driven by the 1000 sim particles
# — so LBS, dynamic binning, and the mix-table merge are measured at the
# size the reference pays (gs_renderer.py:729-757), not fixture scale
N_OBJ_DENSE_BIG = 30000


def build_evaluator(batch, n_table=N_TABLE_SMALL, n_obj_dense=0,
                    wrist_precull="auto", merge_kernel=None):
    import numpy as np

    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.renderer import RasterConfig
    from real2sim_eval_tpu.testing import (full_cfg, make_rope_points,
                                           make_synthetic_scene,
                                           write_fixture_checkpoint)

    root = Path(tempfile.mkdtemp(prefix="bench_"))
    rope = make_rope_points(n=1000, length=0.4)
    write_fixture_checkpoint(root, "bench_rope", rope, spring_Y=2e3)
    gs = make_synthetic_scene(root / "scans", rope_pts=rope, ik_urdf=None,
                              n_table=n_table, n_obj_dense=n_obj_dense)
    gs["use_grid_randomization"] = True
    cfg = full_cfg(root, "bench_rope", gs=gs, cameras=CAMERAS,
                   physics_over=dict(dt=5e-5, self_collision=True))

    import jax

    backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    rc = RasterConfig(backend=backend, kernel=KERNEL,
                      wrist_kernel=WRIST_KERNEL,
                      wrist_precull=wrist_precull)
    if merge_kernel is None:
        merge_kernel = MERGE_KERNEL
    if merge_kernel != rc.merge_kernel:
        import dataclasses
        rc = dataclasses.replace(rc, merge_kernel=merge_kernel)
    ev = BatchedEvaluator(cfg, episode_ids=list(range(batch)),
                          raster_config=rc)
    return ev


def sync(x):
    """Force completion: device_get a tiny dependent slice (the axon tunnel's
    block_until_ready is unreliable — see .claude/skills/verify)."""
    import numpy as np

    return np.asarray(x.reshape(-1)[:2])


def time_loop(fn, out_of, n, warmup=1):
    for _ in range(warmup):
        sync(out_of(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    sync(out_of(r))
    return (time.perf_counter() - t0) / n


def golden_path(n_table: int, n_obj_dense: int = 0) -> Path:
    base = Path(__file__).resolve().parent / "tests" / "golden"
    suffix = "" if KERNEL == "wide" else f"_{KERNEL}"
    # goldens are keyed on the FULL kernel selection: a --wrist-kernel run
    # composites wrist pixels with a different kernel family, so it must
    # assert (and record) its own file, never the base kernel's (advisor
    # round-4: a fine-wrist run would silently overwrite the wide golden)
    if WRIST_KERNEL not in ("inherit", KERNEL):
        suffix += f"_w{WRIST_KERNEL}"
    if n_obj_dense:
        suffix += f"_d{n_obj_dense}"
    if n_table == N_TABLE_SMALL and not suffix:
        return base / "bench_frames.npz"      # pre-dual-size recording
    return base / f"bench_frames{suffix}_{n_table}.npz"


def golden_frame_check(ev, write: bool, n_table: int = N_TABLE_SMALL,
                       n_obj_dense: int = 0, tol: float = 2e-2) -> str:
    """Pixel assertion with ZERO extra compiles: block-mean downsampled
    env-0 frames (fixed cam 0 + wrist) from the flagship compiled render
    vs a committed golden recording (written by ``--write-golden`` after a
    semantic change is independently verified via ``--check``). Returns
    ok | FAIL | no-golden | written | skipped."""
    import jax.numpy as jnp
    import numpy as np

    # goldens are per-kernel files (the fine pipeline crops splats at
    # their 3-sigma fine rects, so its pixels differ from wide by up to
    # ~5e-3 on high-opacity splat fringes — each kernel asserts its own
    # recording, written by --write-golden --kernel <k> after --check)

    # render from the BUILD-TIME state: the timed loop advances physics, so
    # comparing post-loop frames against build-time goldens would diff two
    # different simulation states, not two renderers
    init = getattr(ev, "_bench_init_state", None)
    cur = ev.state
    if init is not None:
        ev.state = init
    ims, _, wims, _ = ev.render()
    ev.state = cur

    def down(img):          # (3, H, W) -> (3, H//8, W//8) block means
        c, h, w = img.shape
        return np.asarray(img[:, :h - h % 8, :w - w % 8]
                          .reshape(c, h // 8, 8, w // 8, 8)
                          .mean(axis=(2, 4)))

    frames = {"fixed0": down(ims[0, 0])}
    if wims.shape[1]:
        frames["wrist0"] = down(wims[0, 0])
    if write:
        gp = golden_path(n_table, n_obj_dense)
        gp.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(gp, **frames)
        return "written"
    if not golden_path(n_table, n_obj_dense).exists():
        return "no-golden"
    gold = np.load(golden_path(n_table, n_obj_dense))
    worst = max(float(np.abs(frames[k] - gold[k]).max())
                for k in frames if k in gold.files)
    return f"ok(d={worst:.1e})" if worst < tol else f"FAIL(d={worst:.1e})"


def calibrated_cfg(base, cam_list, scenes, sh_deg):
    """Budget-calibrate ``base`` for these cameras/scenes the same way the
    evaluator does at build (renderer/calibrate.py) — full-pipeline checks
    at the 100k scale under-render on the uncalibrated defaults."""
    from real2sim_eval_tpu.renderer import calibrate as cal

    return cal.measure_and_plan(base, cam_list, scenes, sh_deg,
                                 scenes["means3D"].shape[1], base.chunk)


def golden_check(ev):
    """Compiled-Pallas pixel check vs the dense reference backend on env 0
    of the real bench scene (VERDICT round-1 item 4: the number BENCH
    reports must come from a code path whose pixels are asserted)."""
    import jax.numpy as jnp
    import numpy as np

    from real2sim_eval_tpu.renderer import RasterConfig
    from real2sim_eval_tpu.renderer.camera import setup_camera
    from real2sim_eval_tpu.renderer.raster import rasterize, rasterize_batch

    scenes = ev.compose_scenes()
    cam, w2c = setup_camera(CAMERAS[0]["w"], CAMERAS[0]["h"],
                            np.asarray(CAMERAS[0]["intr"]).reshape(3, 3),
                            np.linalg.inv(np.asarray(
                                CAMERAS[0]["c2w"]).reshape(4, 4)))
    one = {k: v[:1] for k, v in scenes.items()}
    cfg_p = calibrated_cfg(
        RasterConfig(backend="pallas", kernel=KERNEL),
        [(cam, jnp.asarray(w2c)[None])], one, 0)
    rgb_p, depth_p = rasterize_batch(
        [(cam, jnp.asarray(w2c)[None])], one, 0, config=cfg_p)
    rgb_r, depth_r = rasterize(
        cam, jnp.asarray(w2c), one["means3D"][0], one["scales"][0],
        one["rotations"][0], one["opacities"][0], one["shs"][0][:, :1], 0,
        config=RasterConfig(backend="reference", kernel=KERNEL))
    d_rgb = float(jnp.abs(rgb_p[0, 0] - jnp.clip(rgb_r, 0, 1)).max())
    dep = np.abs(np.asarray(depth_p[0, 0] - depth_r))
    # median depth is discontinuous in alpha (T=0.5 crossing): f16 payload
    # quantization can flip isolated pixels to/from the 15.0 default
    n_flip = int((dep > 1e-2).sum())
    ok = d_rgb < 2e-2 and n_flip <= max(5, int(2e-4 * dep.size))
    print(json.dumps({"metric": "pallas_golden_pixel_check",
                      "value": 1 if ok else 0,
                      "unit": f"max|rgb diff|={d_rgb:.2e}, "
                              f"depth flips={n_flip}",
                      "vs_baseline": 1.0 if ok else 0.0}))
    ok = wrist_golden_check(ev, one) and ok
    if getattr(ev, "_incremental_debug", None) is None:
        # only fail when the incremental path was EXPECTED to be active;
        # non-TPU backends / incremental='off' configs legitimately skip
        import jax

        expected = (ev.raster_config.incremental == "on"
                    or (jax.default_backend() == "tpu"
                        and ev.raster_config.incremental != "off"))
        print(json.dumps({"metric": "incremental_golden_pixel_check",
                          "value": 0 if expected else 1,
                          "unit": "incremental path not active"
                                  + ("" if expected else " (skipped)"),
                          "vs_baseline": 0.0 if expected else 1.0}))
        return ok and not expected
    return ok and incremental_check(ev)


def wrist_golden_check(ev, one):
    """Wrist-camera compiled-Pallas pixels vs the dense reference backend
    on env 0 (VERDICT round-2 weak 5: the single biggest render cost line
    had no compiled-pixel assertion)."""
    import jax.numpy as jnp
    import numpy as np

    from real2sim_eval_tpu.renderer import RasterConfig
    from real2sim_eval_tpu.renderer.camera import Camera, wrist_w2c_jax
    from real2sim_eval_tpu.renderer.raster import rasterize, rasterize_batch
    from real2sim_eval_tpu.utils import transforms as tf

    if not ev.wrist_cameras:
        return True
    w, h, k, e = ev.wrist_cameras[0]
    cam = Camera(width=w, height=h, fx=float(k[0][0]), fy=float(k[1][1]),
                 cx=float(k[0][2]), cy=float(k[1][2]))
    grip = ev.state.grippers[0]
    w2c = wrist_w2c_jax(jnp.asarray(e, jnp.float32), grip[:3],
                        tf.quat_to_rot(grip[6:10]))
    # the wrist family composites with WRIST_KERNEL when set (advisor
    # round-4: --check must validate the exact kernel the throughput run
    # uses, or the wrist-fine combination ships with no pixel assertion)
    wk = KERNEL if WRIST_KERNEL == "inherit" else WRIST_KERNEL
    cfg_p = calibrated_cfg(
        RasterConfig(backend="pallas", kernel=wk),
        [(cam, w2c[None])], one, 0)
    rgb_p, depth_p = rasterize_batch([(cam, w2c[None])], one, 0,
                                     config=cfg_p)
    rgb_r, depth_r = rasterize(
        cam, w2c, one["means3D"][0], one["scales"][0],
        one["rotations"][0], one["opacities"][0], one["shs"][0][:, :1], 0,
        config=RasterConfig(backend="reference", kernel=wk))
    d_rgb = float(jnp.abs(rgb_p[0, 0] - jnp.clip(rgb_r, 0, 1)).max())
    dep = np.abs(np.asarray(depth_p[0, 0] - depth_r))
    # median depth is discontinuous in alpha (T=0.5 crossing): f16 payload
    # quantization can flip isolated pixels to/from the 15.0 default
    n_flip = int((dep > 1e-2).sum())
    ok = d_rgb < 2e-2 and n_flip <= max(5, int(2e-4 * dep.size))
    print(json.dumps({"metric": "wrist_golden_pixel_check",
                      "value": 1 if ok else 0,
                      "unit": f"max|rgb diff|={d_rgb:.2e}, "
                              f"depth flips={n_flip}",
                      "vs_baseline": 1.0 if ok else 0.0}))
    return ok


def incremental_check(ev):
    """Compiled incremental (dirty-tile) path vs the full batched pipeline
    on the [dynamic; static] scene — asserts the pixels the flagship bench
    actually produces for the fixed cameras."""
    import jax.numpy as jnp
    import numpy as np

    from real2sim_eval_tpu.renderer.raster import rasterize_batch

    dbg = ev._incremental_debug
    if dbg.get("kind") == "fine":
        from real2sim_eval_tpu.renderer.incremental_fine import \
            render_incremental_fine as render_incremental
    else:
        from real2sim_eval_tpu.renderer.incremental import \
            render_incremental
    st = ev.state
    dyn, _ = dbg["compose_dyn"](st.rel_pose, st.sm.x, st.grippers, st.qpos7)
    dyn = {k: v[:2] for k, v in dyn.items()}
    B = 2
    rcfg = ev.raster_config
    # validate the budgets the flagship render path actually compiles with
    # (the evaluator CALIBRATES them at build; the dbg dict carries the
    # exact values its jitted render closed over)
    rgb_i, dep_i, tele = render_incremental(dbg["cam_static"], dyn,
                                            dbg["sh_deg"],
                                            dbg.get("rcfg_dyn", rcfg),
                                            t_budget=dbg.get(
                                                "t_budget",
                                                rcfg.dirty_budget),
                                            p_mix=dbg.get(
                                                "p_mix", rcfg.mix_pairs))
    tele = np.asarray(tele)          # [n_dirty, drop_tiles, drop_pairs,
    #                                   binning_dropped] per cam x env —
    # separates budget overflow (loud lanes) from kernel corruption
    sts = dbg["static_scene"]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(sts[k][None], (B,) + sts[k].shape)],
        axis=1) for k in sts}
    cams = [(cam, jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None],
                                   (B, 4, 4)))
            for cam, _, w2c in dbg["cam_static"]]
    # pack-free comparator: the full-pipeline side must stay unquantized
    # so the diff isolates the incremental merge (+ its production f16
    # packing — the merge SORT's order comes from explicit f32/i32 keys,
    # so packing only quantizes attr values ~5e-4, never the tie rule)
    import dataclasses as _dc

    cfg_f = _dc.replace(rcfg, pack_payloads=False)
    rgb_f, dep_f = rasterize_batch(cams, scenes, dbg["sh_deg"],
                                   config=calibrated_cfg(
                                       cfg_f, cams, scenes, dbg["sh_deg"]))
    d_rgb = float(jnp.abs(rgb_i - rgb_f).max())
    dep = np.abs(np.asarray(dep_i - dep_f))
    # median depth is discontinuous in alpha (T=0.5 crossing): f16 payload
    # quantization can flip isolated pixels to/from the 15.0 default
    n_flip = int((dep > 1e-2).sum())
    ok = d_rgb < 2e-2 and n_flip <= max(5, int(2e-4 * dep.size))
    print(json.dumps({"metric": "incremental_golden_pixel_check",
                      "value": 1 if ok else 0,
                      "unit": f"max|rgb diff|={d_rgb:.2e}, "
                              f"depth flips={n_flip}, "
                              f"tele[dirty/dtile/dpair/bdrop]="
                              f"{tele.max(axis=(0, 1)).tolist()}",
                      "vs_baseline": 1.0 if ok else 0.0}))
    return ok


def run_config(args, n_table: int, headline: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_dense = N_OBJ_DENSE_BIG if headline else 0
    ev = build_evaluator(args.batch, n_table, n_obj_dense=n_dense)
    if (WRIST_KERNEL not in ("inherit", KERNEL)
            and getattr(ev, "_incremental_debug", None) is None):
        # the per-family wrist kernel only takes effect on the incremental
        # (per-family) render path; the mixed one-launch pipeline renders
        # every camera with the base kernel (advisor round-4: without this
        # a --wrist-kernel A/B can silently compare wide against wide)
        print(json.dumps({
            "metric": "wrist_kernel_ignored", "value": 0,
            "unit": f"--wrist-kernel {WRIST_KERNEL} has no effect: the "
                    "incremental path is inactive and the mixed pipeline "
                    "uses the base kernel — A/B would be vacuous",
            "vs_baseline": 0.0}), flush=True)
        sys.exit(1)
    ev._bench_init_state = ev.state      # golden checks render this state
    B = args.batch
    n_gauss = int(ev.compose_scenes()["means3D"].shape[1])
    n_dyn = int(ev.obj_means0.shape[0])
    n_dyn += int((np.asarray(ev.mask) > 0).sum())   # articulated robot rows
    if args.check:
        if not golden_check(ev):
            sys.exit(1)
        return
    if args.write_golden:
        print(json.dumps({"metric": "golden_frames",
                          "value": 1,
                          "unit": golden_frame_check(ev, write=True,
                                                     n_table=n_table,
                                                     n_obj_dense=n_dense),
                          "vs_baseline": 1.0}))
        return
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    a = np.concatenate([[0.2, 0.0, 0.3], rot, [1.0]])
    actions = jnp.asarray(np.tile(a, (B, 1)), jnp.float32)

    # step with the FLAGSHIP semantics: velocity-control mimic ON (the
    # reference defaults it on, cfg/env/xarm_gripper.yaml:12 — eval_policy
    # passes cfg.env.robot.do_velocity_control). Forcing it off teleports
    # the eef to the target in one control step, which is both dishonest
    # (no policy run does that) and violent enough to saturate the contact
    # patch budgets (patch_escapes) on envs whose object sits in the path.
    # component: physics + mimic (no render)
    t_phys = time_loop(
        lambda: ev.step(actions).sm.x,
        lambda x: x, args.steps)
    # component: render only (state fixed)
    t_render = time_loop(lambda: ev.render()[0], lambda x: x, args.steps)

    # combined
    def one_step():
        ev.step(actions)
        return ev.observations()["images"]

    dt = time_loop(one_step, lambda x: x, args.steps)

    # saturation counters + golden-frame pixel check ride the DEFAULT run
    # (VERDICT round-2 item 6): the recorded number and the budget/pixel
    # assertions come from one execution. The golden check reuses the
    # ALREADY-COMPILED flagship render (the cross-backend checks under
    # --check each compile a second pipeline — minutes on the remote
    # compile server, too slow for the driver's default run).
    drops = ev.render_drops()
    n_drop = sum(drops.values())
    phys_sat = sum(int(np.sum(v)) for v in ev.telemetry().values())
    if n_drop or phys_sat:
        print(json.dumps({"metric": "budget_saturation",
                          "value": n_drop + phys_sat,
                          "unit": f"render drops {drops}, "
                                  f"physics {ev.telemetry()}",
                          "vs_baseline": 0.0}))
    pix = golden_frame_check(ev, write=False, n_table=n_table,
                             n_obj_dense=n_dense)
    # hard gates (VERDICT round-3 weak 4 + round-4 item 2): a pixel
    # regression, a headline run with no golden on record, OR a run that
    # dropped render pairs / saturated physics budgets must not ship
    # behind a passing exit code — a number measured while dropping
    # contacts or under-rendering is not a valid number. The reference
    # drops nothing, ever (rasterizer_impl.cu:279-311 sizes buffers from
    # the prefix sum; the Warp path queries the BVH every substep).
    # --write-golden is the sanctioned escape for recording a verified
    # change.
    pix_fatal = pix.startswith("FAIL") or (headline and pix == "no-golden")
    sat_fatal = bool(n_drop or phys_sat)
    fatal = pix_fatal or sat_fatal

    n_cams = len(CAMERAS)
    agg = B / dt
    per_env = 1.0 / dt
    result = {
        "metric": ("combined_step_render_env_steps_per_s" if headline
                   else f"combined_step_render_env_steps_per_s_{n_gauss}g"),
        "value": round(agg, 3),
        "unit": (f"aggregate env-steps/s ({B} lockstep envs, {n_gauss} "
                 f"gaussians/env = {n_dyn} LBS-dynamic + "
                 f"{n_gauss - n_dyn} static; each step = 667 substeps + "
                 f"{n_cams}x 848x480 renders; "
                 f"{per_env:.2f} FPS/env; physics {t_phys*1e3:.0f} ms, "
                 f"render {t_render*1e3:.0f} ms, total {dt*1e3:.0f} ms; "
                 f"drops={n_drop} sat={phys_sat} pixel_check={pix})"),
        "vs_baseline": (0.0 if fatal
                        else round(per_env / TARGET_FPS, 4)),
    }
    print(json.dumps(result), flush=True)
    if fatal:
        sys.exit(1)


def check_backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe the default jax platform in a SUBPROCESS: when the TPU
    tunnel is down, in-process ``jax.devices()`` hangs forever (no
    exception), which would turn the driver's bench run into a silent
    timeout instead of a recorded diagnostic."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, timeout=timeout_s, text=True)
        return r.returncode == 0 and bool(r.stdout.strip())
    except Exception:
        return False


def _enable_compile_cache():
    """Persistent XLA compile cache: --check / --write-golden / the default
    run share most pipelines, and the remote TPU compile server costs
    minutes per flagship compile — cache across processes like the test
    suite (tests/conftest.py) and chip_smoke do."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    ap = argparse.ArgumentParser()
    global KERNEL, WRIST_KERNEL, MERGE_KERNEL
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--write-golden", action="store_true",
                    help="record the golden frames the default run asserts "
                         "against (run --check first to validate pixels)")
    ap.add_argument("--kernel", default=KERNEL,
                    choices=("wide", "fine"))
    ap.add_argument("--wrist-kernel", default=WRIST_KERNEL,
                    choices=("inherit", "wide", "fine"),
                    help="compositor for the wrist family only (A/B: the "
                         "wrist full pipeline and the fixed incremental "
                         "path can prefer different kernels)")
    ap.add_argument("--gaussians", type=int, default=0,
                    help="table-splat count for a single-size sweep run; "
                         "0 = the default dual-size run (the ~100k scene "
                         "is the headline, VERDICT round-2 item 4)")
    ap.add_argument("--merge-kernel", default=MERGE_KERNEL,
                    choices=("sort", "stream"),
                    help="incremental merge variant A/B: materialized "
                         "keyed sort vs in-kernel two-pointer merge "
                         "(pixel contract identical — goldens shared)")
    args = ap.parse_args()
    KERNEL = args.kernel
    WRIST_KERNEL = args.wrist_kernel
    MERGE_KERNEL = args.merge_kernel

    _enable_compile_cache()
    if not check_backend_alive():
        print(json.dumps({
            "metric": "combined_step_render_env_steps_per_s",
            "value": 0,
            "unit": "BACKEND UNAVAILABLE: default jax platform hung at "
                    "init (TPU tunnel down) — no measurement taken",
            "vs_baseline": 0.0}), flush=True)
        sys.exit(1)

    if args.gaussians or args.check:
        # sweeps and the cross-backend check run one explicit size
        run_config(args, args.gaussians or N_TABLE_SMALL, headline=True)
        return
    if args.write_golden:
        for nt in (N_TABLE_SMALL, N_TABLE_BIG):
            run_config(args, nt, headline=nt == N_TABLE_BIG)
        return
    run_config(args, N_TABLE_SMALL, headline=False)
    run_config(args, N_TABLE_BIG, headline=True)


if __name__ == "__main__":
    main()
