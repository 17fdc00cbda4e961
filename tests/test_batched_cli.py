"""End-to-end test of the batched evaluation CLI: lockstep episodes must
produce per-episode artifacts in the reference layout."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from real2sim_eval_tpu.config import save_config
from real2sim_eval_tpu.testing import reference_xarm_urdf

from fixtures import (TEST_CAMERAS, full_cfg, make_rope_points,
                      make_synthetic_scene, write_fixture_checkpoint)

IK_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not IK_URDF.exists(),
                                reason="reference assets unavailable")]


def test_eval_policy_batched_cli(tmp_path):
    root = tmp_path
    rope = make_rope_points(n=100, length=0.3)
    write_fixture_checkpoint(root, "rope_test", rope, spring_Y=2e3)
    gs = make_synthetic_scene(root / "scans", rope_pts=rope,
                              ik_urdf=str(IK_URDF))
    gs["use_grid_randomization"] = True
    cfg = full_cfg(root, "rope_test", gs=gs, cameras=TEST_CAMERAS,
                   urdf=reference_xarm_urdf(),
                   physics_over=dict(dt=2e-4, self_collision=False))
    cfg.exp_root = str(root / "log")
    cfg.raster_backend = "reference"
    cfg.timestamp = "batchrun"
    cfg.env.sim.duration = 1
    cfg.batch_size = 3
    cfg.episode_start = 0
    cfg.policy = dict(builtin="hold", n_episodes=3,
                      inference_cfg_path=None, checkpoint_path=None)
    cfg.gs["use_grid_randomization"] = False  # cap episode count at 3
    cfg_dir = root / "cfg"
    save_config(cfg, cfg_dir / "eval_policy_batched.yaml")

    from real2sim_eval_tpu.experiments import eval_policy_batched

    out = eval_policy_batched.cli(["--config-path", str(cfg_dir)])
    for ep in range(3):
        ep_dir = Path(out) / f"episode_{ep:04d}"
        jpgs = sorted((ep_dir / "camera_0" / "rgb").glob("*.jpg"))
        assert len(jpgs) == 31  # 30 steps + final
        assert (ep_dir / "random_variables.json").exists()
        states = sorted((ep_dir / "state").glob("*.pkl"))
        assert len(states) == 30
        with open(states[-1], "rb") as f:
            s = pickle.load(f)
        assert np.isfinite(s["renderer"]["x"]).all()
        with open(states[0], "rb") as f:  # physics kept only at step 0
            s0 = pickle.load(f)
        assert len(s0["physics"]["static_meshes"]) == 1
    # lanes rendered different randomized scenes
    import cv2

    img0 = cv2.imread(str(Path(out) / "start_images/episode_0000_camera_0.jpg"))
    img1 = cv2.imread(str(Path(out) / "start_images/episode_0001_camera_0.jpg"))
    assert img0 is not None and img1 is not None
    assert not np.array_equal(img0, img1)
