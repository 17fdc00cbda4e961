"""End-to-end environment test: the minimum slice from SURVEY.md S7 —
synthetic scene + fixture checkpoint -> reset -> stepped physics ->
rendered RGB-D observations."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.testing import reference_xarm_urdf
from fixtures import (TEST_CAMERAS, full_cfg, make_rope_points,
                      make_synthetic_scene, write_fixture_checkpoint)

IK_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not IK_URDF.exists(),
                                reason="reference assets unavailable")]


@pytest.fixture(scope="module")
def env_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("env")
    rope = make_rope_points(n=200, length=0.3)
    # soft springs: omega*dt_eff must stay < 2 at the coarse test dt
    write_fixture_checkpoint(root, "rope_test", rope, spring_Y=2e3)
    gs = make_synthetic_scene(root / "scans", rope_pts=rope,
                              ik_urdf=str(IK_URDF))
    cfg = full_cfg(root, "rope_test", gs=gs, cameras=TEST_CAMERAS, urdf=reference_xarm_urdf(),
                   physics_over=dict(dt=2e-4))  # 167 substeps: CPU test speed
    return cfg


def test_registry_make(env_setup):
    import real2sim_eval_tpu.envs as envs

    assert "BaseEnv-v0" in envs.REGISTERED_ENVS
    env = envs.make("BaseEnv-v0", max_episode_steps=5, cfg=env_setup,
                    randomize=False,
                    raster_config=_ref_raster())
    assert env is not None


def test_gym_make_works(env_setup):
    import gymnasium as gym
    import real2sim_eval_tpu.envs  # noqa: F401 - triggers registration

    env = gym.make("BaseEnv-v0", max_episode_steps=5, cfg=env_setup,
                   randomize=False, raster_config=_ref_raster())
    assert env.spec.id == "BaseEnv-v0"


def _ref_raster():
    from real2sim_eval_tpu.renderer import RasterConfig

    return RasterConfig(backend="reference")


class TestEpisode:
    @pytest.fixture(scope="class")
    def env(self, env_setup):
        import real2sim_eval_tpu.envs as envs

        env = envs.make("BaseEnv-v0", max_episode_steps=100, cfg=env_setup,
                        randomize=False, raster_config=_ref_raster())
        return env

    def test_reset_obs_layout(self, env):
        obs, info = env.reset(seed=0)
        assert len(obs["image_list"]) == 1
        assert len(obs["image_wrist_list"]) == 1
        assert obs["image_list"][0].shape == (3, 64, 128)
        assert obs["depth_list"][0].shape == (64, 128)
        robot = obs["robot"]
        np.testing.assert_allclose(np.asarray(robot["eef_xyz"][0]),
                                   [0.2568, 0.0, 0.4005], atol=1e-5)
        assert robot["eef_quat"].shape == (1, 4)
        assert robot["eef_gripper"].shape == (1, 1)
        img = np.asarray(obs["image_list"][0])
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert img.max() > 0.05  # scene is visible

    def test_step_then_obs(self, env):
        obs, _ = env.reset(seed=0)
        rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
        action = np.concatenate([[0.2568, 0.0, 0.39], rot, [1.0]])[None]
        env.step({"action": jnp.asarray(action, jnp.float32),
                  "do_velocity_control": False})
        obs2 = env.unwrapped.get_obs()
        # eef moved down
        assert float(obs2["robot"]["eef_xyz"][0, 2]) < 0.4005
        # state dump shape for success calculators
        dump = env.unwrapped.get_state()
        assert np.isfinite(dump["renderer"]["x"]).all(), "physics blew up"
        assert dump["renderer"]["x"].shape == (200, 3)
        assert dump["physics"]["init_springs"].ndim == 2
        assert len(dump["physics"]["static_meshes"]) == 1

    def test_velocity_control_path(self, env):
        obs, _ = env.reset(seed=1)
        rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
        target = np.concatenate([[0.40, 0.1, 0.30], rot, [1.0]])[None]
        env.step({"action": jnp.asarray(target, jnp.float32),
                  "do_velocity_control": True})
        obs2 = env.unwrapped.get_obs()
        moved = np.linalg.norm(np.asarray(obs2["robot"]["eef_xyz"][0])
                               - [0.2568, 0.0, 0.4005])
        full_jump = np.linalg.norm(np.array([0.40, 0.1, 0.30])
                                   - [0.2568, 0.0, 0.4005])
        # velocity mimic slows the motion: moved a bit, but nowhere near all
        assert 1e-4 < moved < 0.5 * full_jump

    def test_determinism_same_seed(self, env_setup):
        import real2sim_eval_tpu.envs as envs

        outs = []
        for _ in range(2):
            env = envs.make("BaseEnv-v0", max_episode_steps=10,
                            cfg=env_setup, randomize=True,
                            raster_config=_ref_raster())
            obs, _ = env.reset(seed=3)
            rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
            action = np.concatenate([[0.25, 0.0, 0.35], rot, [0.5]])[None]
            env.step({"action": jnp.asarray(action, jnp.float32),
                      "do_velocity_control": False})
            outs.append(np.asarray(env.unwrapped.renderer.state["x"]))
        np.testing.assert_allclose(outs[0], outs[1], atol=0.0)
