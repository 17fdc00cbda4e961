"""Renderer stack tests: LBS goldens, color correction, articulation,
and the GSRenderer facade over a synthetic scene."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer import lbs as lbs_mod
from real2sim_eval_tpu.renderer.scene import (correct_sh_colors,
                                              grid_random_values,
                                              apply_random_pose)
from real2sim_eval_tpu.utils.sh import C0
from real2sim_eval_tpu.utils import transforms as tf

from real2sim_eval_tpu.testing import reference_xarm_urdf
from fixtures import (TEST_CAMERAS, full_cfg, make_rope_points,
                      make_synthetic_scene, write_fixture_checkpoint)

pytestmark = pytest.mark.slow

IK_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")


class TestLBS:
    def test_rigid_translation_exact(self, rng):
        bones = jnp.asarray(rng.random((50, 3)), jnp.float32)
        motion = jnp.asarray([0.1, -0.2, 0.05], jnp.float32)
        motions = jnp.tile(motion, (50, 1))
        pts = jnp.asarray(rng.random((200, 3)), jnp.float32)
        relations = lbs_mod.knn_relations(bones)
        w, wi = lbs_mod.knn_weights(bones, pts)
        out, _ = lbs_mod.interpolate_motions(bones, motions, relations, w, wi, pts)
        np.testing.assert_allclose(out, pts + motion, atol=1e-5)

    def test_rigid_rotation_exact(self, rng):
        """A rigid rotation of the bones must map attached points exactly."""
        bones = jnp.asarray(rng.random((60, 3)) - 0.5, jnp.float32)
        R = tf.axis_angle_to_rot(jnp.asarray([0.0, 0.0, 0.4]))
        bones_new = bones @ R.T
        pts = jnp.asarray(rng.random((100, 3)) - 0.5, jnp.float32)
        relations = lbs_mod.knn_relations(bones)
        w, wi = lbs_mod.knn_weights(bones, pts)
        out, quat = lbs_mod.interpolate_motions(
            bones, bones_new - bones, relations, w, wi, pts,
            quat=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (100, 1)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts @ R.T),
                                   atol=2e-3)
        # blended quat should be the rotation itself
        expected_q = np.asarray(tf.rot_to_quat(R))
        got = np.asarray(quat[0]) * np.sign(quat[0, 0]) * np.sign(expected_q[0])
        np.testing.assert_allclose(np.abs(np.dot(got, expected_q)), 1.0, atol=1e-3)

    def test_simple_weights_interpolation(self, rng):
        bones = jnp.asarray(rng.random((30, 3)), jnp.float32)
        pts = bones[:10]  # particles exactly on bones
        w, wi = lbs_mod.simple_weights(bones, pts, k=4)
        moved = bones + 0.1
        out = lbs_mod.simple_apply(w, wi, moved)
        np.testing.assert_allclose(out, pts + 0.1, atol=1e-4)


class TestColorCorrection:
    def test_linear_identity(self, rng):
        shs = rng.normal(size=(10, 16, 3)).astype(np.float32)
        out = correct_sh_colors(shs, np.eye(3), np.zeros(3))
        np.testing.assert_allclose(out, shs, atol=1e-6)

    def test_linear_decoded_color_maps_affinely(self, rng):
        """DC-decoded color must transform as A @ c + b."""
        A = rng.normal(size=(3, 3)).astype(np.float32)
        b = rng.normal(size=3).astype(np.float32) * 0.1
        shs = rng.normal(size=(5, 16, 3)).astype(np.float32)
        out = correct_sh_colors(shs, A, b)
        color_in = C0 * shs[:, 0] + 0.5
        color_out = C0 * out[:, 0] + 0.5
        np.testing.assert_allclose(color_out, color_in @ A.T + b, atol=1e-5)
        # higher bands: linear part only
        np.testing.assert_allclose(out[:, 1:], shs[:, 1:] @ A.T, atol=1e-5)

    def test_quadratic_decoded_color(self, rng):
        A = rng.normal(size=(3, 6)).astype(np.float32) * 0.5
        b = rng.normal(size=3).astype(np.float32) * 0.1
        A2, A1 = A[:, :3], A[:, 3:]
        shs = rng.normal(size=(4, 16, 3)).astype(np.float32) * 0.3
        out = correct_sh_colors(shs, A, b)
        c = C0 * shs[:, 0] + 0.5
        expected = (c ** 2) @ A2.T + c @ A1.T + b
        got = C0 * out[:, 0] + 0.5
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestRandomization:
    def test_grid_index_arithmetic(self):
        xy = [[-1, -1], [0, 0], [1, 1]]
        theta = [-10, 0, 10]
        # one_to_one=False: index = xy_index * len(theta) + theta_index
        rx, ry, rz, ra = grid_random_values(4, xy, theta, one_to_one=False)
        assert (rx, ry) == (0, 0) and ra == 0.0
        rx, ry, rz, ra = grid_random_values(5, xy, theta, one_to_one=False)
        assert (rx, ry) == (0, 0)
        np.testing.assert_allclose(ra, 10 * np.pi / 180)
        # one_to_one
        rx, ry, _, ra = grid_random_values(2, xy, theta, one_to_one=True)
        assert (rx, ry) == (1, 1)

    def test_apply_random_pose(self):
        pose = np.eye(4)
        out = apply_random_pose(pose, (0.1, 0.2, 0.0, np.pi / 2))
        np.testing.assert_allclose(out[:3, 3], [0.1, 0.2, 0.0], atol=1e-12)
        np.testing.assert_allclose(out[:3, 0], [0, 1, 0], atol=1e-12)


@pytest.mark.skipif(not IK_URDF.exists(), reason="reference assets unavailable")
class TestGSRendererFacade:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("scene")
        gs = make_synthetic_scene(root / "scans", ik_urdf=str(IK_URDF))
        cfg = full_cfg(root, "rope_test", gs=gs, cameras=TEST_CAMERAS, urdf=reference_xarm_urdf())
        from real2sim_eval_tpu.renderer import GSRenderer, RasterConfig

        r = GSRenderer(cfg, raster_config=RasterConfig(backend="reference"))
        r.load_scaniverse(randomize=False)
        r.set_all_cameras()
        r.reset_state()
        return cfg, r

    def test_scene_loaded(self, setup):
        cfg, r = setup
        assert r.rendervar["means3D"].shape[0] == 300
        assert "clip" in r.params_meshes
        assert r.state["x"].shape == (300, 3)
        # object posed at x+0.15
        assert 0.1 < float(np.asarray(r.rendervar["means3D"])[:, 0].mean()) < 0.35

    def test_render_fixed_and_wrist(self, setup):
        cfg, r = setup
        ims, depths = r.render_fixed_cameras()
        assert len(ims) == 1
        assert ims[0].shape == (3, 64, 128)
        assert depths[0].shape == (64, 128)
        assert np.isfinite(np.asarray(ims[0])).all()
        # something must actually be visible (non-background pixels)
        assert float(jnp.max(ims[0])) > 0.05
        ims_w, _ = r.render_wrist_cameras()
        assert len(ims_w) == 1

    def test_update_state_moves_object_gaussians(self, setup):
        cfg, r = setup
        x = np.asarray(r.state["x"])
        state = {
            "x": jnp.asarray(x + [0.0, 0.0, 0.05]),
            "v": jnp.zeros_like(r.state["v"]),
            "eef_xyz": jnp.asarray([[0.2568, 0.0, 0.4005]], jnp.float32),
            "eef_vel": jnp.zeros((1, 3)),
            "eef_quat": jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
            "eef_quat_vel": jnp.zeros((1, 3)),
            "eef_gripper": jnp.asarray([[1.0]], jnp.float32),
        }
        before = np.asarray(r.rendervar_full["means3D"][:300]).copy()
        r.update_state(state)
        after = np.asarray(r.rendervar_full["means3D"][:300])
        np.testing.assert_allclose(after - before, 0.05 * np.tile([0, 0, 1], (300, 1)),
                                   atol=2e-3)

    def test_robot_gaussians_follow_qpos(self, setup):
        cfg, r = setup
        from real2sim_eval_tpu.kinematics.robot import CANONICAL_ARM_QPOS

        mask = r.total_mask_full
        n_obj = 300
        # move joint1 by 0.3 rad via qpos path
        q = CANONICAL_ARM_QPOS.copy()
        q[0] += 0.3
        qpos = np.concatenate([q, [0.0]])[None]
        state = {
            "x": r.state["x"],
            "v": r.state["v"],
            "qpos": jnp.asarray(qpos, jnp.float32),
            "current_openness": jnp.asarray([1.0]),
        }
        table_before = np.asarray(r.table_rendervar["means3D"])
        r.update_state(state)
        full = np.asarray(r.rendervar_full["means3D"])
        table_after = full[-len(table_before):]
        moved = np.linalg.norm(table_after - table_before, axis=-1)
        # table splats (mask 0) stay put; arm link splats move
        assert moved[mask == 0].max() < 1e-4
        arm_mask = (mask >= 3) & (mask <= 8)
        assert moved[arm_mask].mean() > 0.01

    def test_mimic_velocity_control_limits(self, setup):
        cfg, r = setup
        # ask for a huge jump; mimic must move only a fraction
        action = np.zeros((1, 13), np.float32)
        action[0, 0:3] = [0.5, 0.3, 0.3]
        action[0, 3:12] = np.diag([1.0, -1.0, -1.0]).reshape(-1)
        action[0, 12] = 0.0  # close command
        out = np.asarray(r.mimic_velocity_control(jnp.asarray(action)))
        # position moved toward target but far less than the full jump
        assert np.linalg.norm(out[0, :3] - action[0, :3]) > 0.05
        # gripper speed limited to 2/30 per step from current openness
        cur = r.gripper_openness_curr_xarm / 800.0
        np.testing.assert_allclose(out[0, 12], cur - 2.0 / 30.0, atol=1e-5)


@pytest.mark.skipif(not IK_URDF.exists(), reason="reference assets unavailable")
def test_grid_randomization_episode_indexing(tmp_path):
    gs = make_synthetic_scene(tmp_path / "scans", ik_urdf=str(IK_URDF))
    gs["use_grid_randomization"] = True
    cfg = full_cfg(tmp_path, "rope_test", gs=gs, cameras=TEST_CAMERAS, urdf=reference_xarm_urdf())
    from real2sim_eval_tpu.renderer import GSRenderer, RasterConfig

    r = GSRenderer(cfg, raster_config=RasterConfig(backend="reference"))
    r.load_scaniverse(randomize=True, index=4)  # xy cell 1, theta 0+...
    assert len(r.random_variables) == 1  # object only (mesh has no grid cfg)
    rx, ry, rz, ra = r.random_variables[0]
    # index 4 -> true_index 4 (n_obj = 9), xy_index=1, theta_index=1
    assert (rx, ry) == (0.0, 0.0)
    assert ra == 0.0
    # same index reproduces the same layout
    r2 = GSRenderer(cfg, raster_config=RasterConfig(backend="reference"))
    r2.load_scaniverse(randomize=True, index=4)
    np.testing.assert_allclose(np.asarray(r2.rendervar["means3D"]),
                               np.asarray(r.rendervar["means3D"]))
