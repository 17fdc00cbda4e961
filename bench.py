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
GROUPS = 4


def build_evaluator(batch):
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
                              n_table=30000)
    gs["use_grid_randomization"] = True
    cfg = full_cfg(root, "bench_rope", gs=gs, cameras=CAMERAS,
                   physics_over=dict(dt=5e-5, self_collision=True))

    import jax

    backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    ev = BatchedEvaluator(cfg, episode_ids=list(range(batch)),
                          raster_config=RasterConfig(backend=backend,
                                                     kernel=KERNEL,
                                                     octet_groups=GROUPS))
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
    rgb_p, depth_p = rasterize_batch(
        [(cam, jnp.asarray(w2c)[None])], one, 0,
        config=RasterConfig(backend="pallas", kernel=KERNEL,
                            octet_groups=GROUPS))
    rgb_r, depth_r = rasterize(
        cam, jnp.asarray(w2c), one["means3D"][0], one["scales"][0],
        one["rotations"][0], one["opacities"][0], one["shs"][0][:, :1], 0,
        config=RasterConfig(backend="reference", kernel=KERNEL,
                            octet_groups=GROUPS))
    d_rgb = float(jnp.abs(rgb_p[0, 0] - jnp.clip(rgb_r, 0, 1)).max())
    d_dep = float(jnp.abs(depth_p[0, 0] - depth_r).max())
    ok = d_rgb < 2e-2 and d_dep < 1e-2
    print(json.dumps({"metric": "pallas_golden_pixel_check",
                      "value": 1 if ok else 0,
                      "unit": f"max|rgb diff|={d_rgb:.2e}, "
                              f"max|depth diff|={d_dep:.2e}",
                      "vs_baseline": 1.0 if ok else 0.0}))
    return ok and incremental_check(ev)


def incremental_check(ev):
    """Compiled incremental (dirty-tile) path vs the full batched pipeline
    on the [dynamic; static] scene — asserts the pixels the flagship bench
    actually produces for the fixed cameras."""
    import jax.numpy as jnp
    import numpy as np

    from real2sim_eval_tpu.renderer.incremental import render_incremental
    from real2sim_eval_tpu.renderer.raster import rasterize_batch

    dbg = getattr(ev, "_incremental_debug", None)
    if dbg is None:
        print(json.dumps({"metric": "incremental_golden_pixel_check",
                          "value": 0, "unit": "incremental path not active",
                          "vs_baseline": 0.0}))
        return False
    st = ev.state
    dyn, _ = dbg["compose_dyn"](st.rel_pose, st.sm.x, st.grippers, st.qpos7)
    dyn = {k: v[:2] for k, v in dyn.items()}
    B = 2
    rcfg = ev.raster_config
    rgb_i, dep_i, _ = render_incremental(dbg["cam_static"], dyn,
                                         dbg["sh_deg"], rcfg)
    sts = dbg["static_scene"]
    scenes = {k: jnp.concatenate(
        [dyn[k], jnp.broadcast_to(sts[k][None], (B,) + sts[k].shape)],
        axis=1) for k in sts}
    cams = [(cam, jnp.broadcast_to(jnp.asarray(w2c, jnp.float32)[None],
                                   (B, 4, 4)))
            for cam, _, w2c in dbg["cam_static"]]
    rgb_f, dep_f = rasterize_batch(cams, scenes, dbg["sh_deg"], config=rcfg)
    d_rgb = float(jnp.abs(rgb_i - rgb_f).max())
    d_dep = float(jnp.abs(dep_i - dep_f).max())
    ok = d_rgb < 2e-2 and d_dep < 1e-2
    print(json.dumps({"metric": "incremental_golden_pixel_check",
                      "value": 1 if ok else 0,
                      "unit": f"max|rgb diff|={d_rgb:.2e}, "
                              f"max|depth diff|={d_dep:.2e}",
                      "vs_baseline": 1.0 if ok else 0.0}))
    return ok


def main():
    ap = argparse.ArgumentParser()
    global KERNEL, GROUPS
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--kernel", default=KERNEL,
                    choices=("wide", "octet"))
    ap.add_argument("--groups", type=int, default=GROUPS)
    args = ap.parse_args()
    KERNEL = args.kernel
    GROUPS = args.groups

    import jax
    import jax.numpy as jnp
    import numpy as np

    ev = build_evaluator(args.batch)
    B = args.batch
    if args.check:
        if not golden_check(ev):
            sys.exit(1)
        return
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    a = np.concatenate([[0.2, 0.0, 0.3], rot, [1.0]])
    actions = jnp.asarray(np.tile(a, (B, 1)), jnp.float32)

    # component: physics only
    t_phys = time_loop(
        lambda: ev.step(actions, do_velocity_control=False).sm.x,
        lambda x: x, args.steps)
    # component: render only (state fixed)
    t_render = time_loop(lambda: ev.render()[0], lambda x: x, args.steps)

    # combined
    def one_step():
        ev.step(actions, do_velocity_control=False)
        return ev.observations()["images"]

    dt = time_loop(one_step, lambda x: x, args.steps)

    n_cams = len(CAMERAS)
    agg = B / dt
    per_env = 1.0 / dt
    result = {
        "metric": "combined_step_render_env_steps_per_s",
        "value": round(agg, 3),
        "unit": (f"aggregate env-steps/s ({B} lockstep envs; each step = "
                 f"667 substeps + {n_cams}x 848x480 renders; "
                 f"{per_env:.2f} FPS/env; physics {t_phys*1e3:.0f} ms, "
                 f"render {t_render*1e3:.0f} ms, total {dt*1e3:.0f} ms)"),
        "vs_baseline": round(per_env / TARGET_FPS, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
