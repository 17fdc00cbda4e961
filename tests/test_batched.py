"""Batched evaluator tests: lockstep multi-env stepping must agree with the
single-env path, and the batch must shard over a virtual device mesh."""

from pathlib import Path

import jax
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
def batch_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("batched")
    rope = make_rope_points(n=120, length=0.3)
    write_fixture_checkpoint(root, "rope_test", rope, spring_Y=2e3)
    gs = make_synthetic_scene(root / "scans", rope_pts=rope,
                              ik_urdf=str(IK_URDF))
    gs["use_grid_randomization"] = True
    cfg = full_cfg(root, "rope_test", gs=gs, cameras=TEST_CAMERAS, urdf=reference_xarm_urdf(),
                   physics_over=dict(dt=2e-4, self_collision=False))
    cfg.raster_backend = "reference"
    return cfg


def hold_actions(B):
    rot = np.diag([1.0, -1.0, -1.0]).reshape(-1)
    a = np.concatenate([[0.2568, 0.0, 0.4005], rot, [1.0]])
    return jnp.asarray(np.tile(a, (B, 1)), jnp.float32)


@pytest.fixture(scope="module")
def evaluator(batch_cfg):
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.renderer import RasterConfig

    return BatchedEvaluator(batch_cfg, episode_ids=[0, 1, 2, 3],
                            raster_config=RasterConfig(backend="reference"))


class TestBatchedEvaluator:
    def test_randomized_lanes_differ(self, evaluator):
        x = np.asarray(evaluator.state.sm.x)
        assert x.shape[0] == 4
        assert not np.allclose(x[0], x[1])  # grid cells differ
        rp = np.asarray(evaluator.state.rel_pose)
        np.testing.assert_allclose(rp[0], np.eye(4), atol=1e-6)
        assert not np.allclose(rp[1], np.eye(4))

    def test_step_moves_all_lanes(self, evaluator):
        x0 = np.asarray(evaluator.state.sm.x)
        for _ in range(3):
            evaluator.step(hold_actions(4), do_velocity_control=False)
        x1 = np.asarray(evaluator.state.sm.x)
        assert np.isfinite(x1).all()
        # all lanes fell toward the table
        assert (x1[:, :, 2].mean(axis=1) <= x0[:, :, 2].mean(axis=1) + 1e-6).all()

    def test_step_mimic_fused_matches_sequence(self, evaluator):
        """The velocity-control path runs ONE fused dispatch
        (_step_mimic); it must compute exactly the mimic-then-step
        sequence (reference semantics: gs_renderer.py:1115-1166 followed
        by env.step's physics)."""
        state0 = evaluator.state
        acts = hold_actions(4)
        try:
            fused = evaluator._step_mimic(state0, acts)
            acts2, new_q = evaluator._mimic(
                acts, state0.qpos7, state0.grippers[:, 13] * 800.0)
            manual = evaluator._step(state0.replace(qpos7=new_q), acts2)
            np.testing.assert_allclose(np.asarray(fused.sm.x),
                                       np.asarray(manual.sm.x), atol=1e-6)
            np.testing.assert_allclose(np.asarray(fused.grippers),
                                       np.asarray(manual.grippers),
                                       atol=1e-6)
            np.testing.assert_array_equal(np.asarray(fused.qpos7),
                                          np.asarray(manual.qpos7))
        finally:
            evaluator.state = state0   # module-scoped fixture: restore

    def test_batched_render_shapes(self, evaluator):
        obs = evaluator.observations()
        assert obs["images"].shape == (4, 1, 3, 64, 128)
        assert obs["depths"].shape == (4, 1, 64, 128)
        assert obs["wrist_images"].shape == (4, 1, 3, 64, 128)
        assert obs["observation.state"].shape == (4, 8)
        imgs = np.asarray(obs["images"])
        assert np.isfinite(imgs).all()
        assert imgs.max() > 0.05
        # different randomized poses -> different renderings
        assert not np.allclose(imgs[0], imgs[1])

    def test_matches_single_env(self, batch_cfg):
        """Lane k of the batch must track a single env run of episode k."""
        import real2sim_eval_tpu.envs as envs
        from real2sim_eval_tpu.parallel import BatchedEvaluator
        from real2sim_eval_tpu.renderer import RasterConfig

        ev = BatchedEvaluator(batch_cfg, episode_ids=[2],
                              raster_config=RasterConfig(backend="reference"))
        env = envs.make(batch_cfg.env_name, max_episode_steps=100,
                        cfg=batch_cfg, randomize=True,
                        raster_config=RasterConfig(backend="reference"))
        obs, _ = env.reset(seed=2)
        state = env.unwrapped.renderer.get_state()

        actions = hold_actions(1)
        for _ in range(2):
            ev.step(actions, do_velocity_control=False)
            env.step({"action": actions, "do_velocity_control": False})
        x_single = np.asarray(env.unwrapped.physics.sm_state.x)
        x_batch = np.asarray(ev.state.sm.x[0])
        np.testing.assert_allclose(x_batch, x_single, atol=1e-4)

    def test_state_dumps_schema(self, evaluator):
        dumps = evaluator.get_state_dumps()
        assert len(dumps) == 4
        for d in dumps:
            assert d["renderer"]["x"].ndim == 2
            assert len(d["physics"]["static_meshes"]) == 1
            assert np.isfinite(d["renderer"]["x"]).all()


class TestMeshSharding:
    def test_shard_batch_over_8_devices(self, batch_cfg):
        from real2sim_eval_tpu.parallel import BatchedEvaluator, make_env_mesh, shard_batch
        from real2sim_eval_tpu.renderer import RasterConfig

        assert len(jax.devices()) == 8  # conftest virtual mesh
        ev = BatchedEvaluator(batch_cfg, episode_ids=list(range(8)),
                              raster_config=RasterConfig(backend="reference"))
        mesh = make_env_mesh(8)
        ev.state = shard_batch(ev.state, mesh)
        shard_devs = {d for d in ev.state.sm.x.devices()}
        assert len(shard_devs) == 8  # actually distributed

        ev.step(hold_actions(8), do_velocity_control=False)
        assert np.isfinite(np.asarray(ev.state.sm.x)).all()
        # per-env stat aggregates across the mesh (one collective)
        from real2sim_eval_tpu.parallel.mesh import mean_over_envs

        mean_z = mean_over_envs(ev.state.sm.x[:, :, 2].mean(axis=1))
        assert np.isfinite(float(mean_z))


def test_pallas_physics_backend_matches_xla(batch_cfg):
    """BatchedEvaluator with the fused Pallas physics step (interpret mode
    on CPU) must track the XLA scan backend."""
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.renderer import RasterConfig

    evs = {}
    for backend in ("xla", "pallas"):
        ev = BatchedEvaluator(batch_cfg, episode_ids=[0, 1],
                              raster_config=RasterConfig(backend="reference"),
                              physics_backend=backend)
        assert ev.physics_backend_resolved == backend
        for _ in range(2):
            ev.step(hold_actions(2), do_velocity_control=False)
        evs[backend] = ev
    np.testing.assert_allclose(
        np.asarray(evs["pallas"].state.sm.x), np.asarray(evs["xla"].state.sm.x),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(evs["pallas"].state.grippers),
        np.asarray(evs["xla"].state.grippers), atol=1e-5)


def test_checkpoint_resume_mid_episode(batch_cfg, tmp_path):
    """Mid-episode save/load must continue bit-identically."""
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.renderer import RasterConfig

    ev = BatchedEvaluator(batch_cfg, episode_ids=[0, 1],
                          raster_config=RasterConfig(backend="reference"))
    acts = hold_actions(2)
    ev.step(acts, do_velocity_control=False)
    ev.save_state(tmp_path / "snap.pkl")
    ev.step(acts, do_velocity_control=False)
    x_expected = np.asarray(ev.state.sm.x)

    ev.load_state(tmp_path / "snap.pkl")
    ev.step(acts, do_velocity_control=False)
    np.testing.assert_array_equal(np.asarray(ev.state.sm.x), x_expected)
