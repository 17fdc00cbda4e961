"""Benchmark: combined physics-step + 480p splat render throughput.

The BASELINE.md north star: batched environments on one chip, each step =
one 30 Hz control step (667 physics substeps with self-collision + SDF
contacts) + one 848x480 splat render per env. Reports per-env FPS;
vs_baseline is against the 60 FPS/env target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BATCH = 8
N_STEPS = 10
TARGET_FPS = 60.0


def build_evaluator():
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
    cameras = [dict(
        type="side", h=480, w=848,
        intr=[427.3, 0.0, 430.0, 0.0, 426.8, 242.8, 0.0, 0.0, 1.0],
        c2w=[0.005, 0.613, -0.790, 0.883,
             1.0, -0.004, 0.004, 0.054,
             -0.001, -0.790, -0.613, 0.398,
             0.0, 0.0, 0.0, 1.0])]
    cfg = full_cfg(root, "bench_rope", gs=gs, cameras=cameras,
                   physics_over=dict(dt=5e-5, self_collision=True))

    import jax

    backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    ev = BatchedEvaluator(cfg, episode_ids=list(range(BATCH)),
                          raster_config=RasterConfig(backend=backend))
    return ev


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    ev = build_evaluator()
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    a = np.concatenate([[0.2, 0.0, 0.3], rot, [1.0]])
    actions = jnp.asarray(np.tile(a, (BATCH, 1)), jnp.float32)

    # warm up / compile
    ev.step(actions, do_velocity_control=False)
    obs = ev.observations()
    jax.block_until_ready(obs["images"])

    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        ev.step(actions, do_velocity_control=False)
        obs = ev.observations()
    jax.block_until_ready(obs["images"])
    dt = (time.perf_counter() - t0) / N_STEPS

    agg = BATCH / dt                  # total env-steps per second
    per_env = 1.0 / dt                # steps/s each env advances
    result = {
        "metric": "combined_step_render_env_steps_per_s",
        "value": round(agg, 3),
        "unit": (f"aggregate env-steps/s ({BATCH} lockstep envs; each step = "
                 f"667 physics substeps + 848x480 splat render; "
                 f"{per_env:.2f} FPS per env)"),
        "vs_baseline": round(per_env / TARGET_FPS, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
