"""Mid-episode checkpoint/resume of the batched eval loop.

VERDICT round-2 item 8: a killed batch run must resume losing at most
``checkpoint_every`` steps — finer-grained recovery than the reference's
process-per-GPU episode granularity (eval_policy_parallel.py:274-287)."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from real2sim_eval_tpu.testing import reference_xarm_urdf
from fixtures import (TEST_CAMERAS, full_cfg, make_rope_points,
                      make_synthetic_scene, write_fixture_checkpoint)

IK_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not IK_URDF.exists(),
                                 reason="reference assets unavailable")]


def _cfg(root):
    rope = make_rope_points(n=100, length=0.3)
    write_fixture_checkpoint(root, "rope_rs", rope, spring_Y=2e3)
    gs = make_synthetic_scene(root / "scans", rope_pts=rope,
                              ik_urdf=str(IK_URDF), n_table=300)
    cfg = full_cfg(root, "rope_rs", gs=gs, cameras=TEST_CAMERAS,
                   urdf=reference_xarm_urdf(),
                   physics_over=dict(dt=2e-4, self_collision=False))
    cfg.exp_root = str(root / "log")
    cfg.timestamp = "resumerun"
    cfg.env.sim.duration = 1          # 30 control steps
    cfg.raster_backend = "reference"
    cfg.policy = dict(builtin="hold", n_episodes=2,
                      inference_cfg_path=None, checkpoint_path=None)
    cfg.batch_size = 2
    cfg.checkpoint_every = 5
    cfg.telemetry_every = 10
    cfg.resume = True
    return cfg


def test_kill_and_resume_mid_episode(tmp_path):
    from real2sim_eval_tpu.experiments import eval_policy_batched as epb

    cfg = _cfg(tmp_path)

    # sabotage: die at step 12 (after the step-10 checkpoint landed)
    orig = epb.EpisodeWriter.write_robot

    def bomb(self, step, *a, **kw):
        if step >= 12:
            raise KeyboardInterrupt("simulated crash")
        return orig(self, step, *a, **kw)

    epb.EpisodeWriter.write_robot = bomb
    try:
        with pytest.raises(KeyboardInterrupt):
            epb.main(cfg)
    finally:
        epb.EpisodeWriter.write_robot = orig

    run = (Path(cfg.exp_root) / "output_eval_policy" / "resumerun")
    ckpt = run / "batch_00000.ckpt.pkl"
    assert ckpt.exists(), "periodic checkpoint must exist after the crash"
    with open(ckpt, "rb") as f:
        blob = pickle.load(f)
    assert blob["extra"]["next_step"] == 10   # last multiple of 5 before 12

    out = epb.main(cfg)                        # resume
    ep = Path(out) / "episode_0000"
    jsons = sorted((ep / "robot").glob("*.json"))
    assert len(jsons) == 30, "resumed run must complete all control steps"
    # continuity: the pre-crash step-9 artifact survives untouched and the
    # post-resume steps continue the same trajectory (hold policy => same
    # eef pose before and after)
    with open(ep / "robot" / "000009.json") as f:
        before = json.load(f)
    with open(ep / "robot" / "000011.json") as f:
        after = json.load(f)
    np.testing.assert_allclose(before["obs.ee_pos"], after["obs.ee_pos"],
                               atol=5e-3)
    assert not ckpt.exists(), "completed batch must clean its checkpoint"
    assert (run / "batch_00000.done").exists()

    # a second resume invocation is a no-op (done marker)
    out2 = epb.main(cfg)
    assert out2 == out
