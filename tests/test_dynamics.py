import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.physics.dynamics import GraspState, PhysTwinDynamics, grasp_update

from fixtures import full_cfg, make_box_points, make_rope_points, write_fixture_checkpoint


class TestGraspStateMachine:
    """Port-parity tests for the openness hysteresis (phystwin.py:382-415)."""

    THRESH = 3e4

    def s(self, current=1.0, grasped=False, initialized=True):
        return GraspState(current_openness=jnp.asarray(current),
                          grasped=jnp.asarray(grasped),
                          initialized=jnp.asarray(initialized))

    def f(self, norm):
        return jnp.array([[norm, 0.0, 0.0], [norm, 0.0, 0.0]])

    def test_first_step_initializes(self):
        o0, o1, ns = grasp_update(self.s(0.7, initialized=False),
                                  jnp.asarray(0.3), self.f(0.0), self.THRESH)
        # uninitialized -> current snaps to the command
        assert float(ns.current_openness) == pytest.approx(0.3)
        assert float(o1) == pytest.approx(0.3)

    def test_opening_follows_command(self):
        o0, o1, ns = grasp_update(self.s(0.2), jnp.asarray(0.8),
                                  self.f(0.0), self.THRESH)
        assert float(ns.current_openness) == pytest.approx(0.8)
        assert not bool(ns.grasped)

    def test_closing_free_follows_command(self):
        o0, o1, ns = grasp_update(self.s(0.8), jnp.asarray(0.3),
                                  self.f(50.0), self.THRESH)
        assert float(ns.current_openness) == pytest.approx(0.3)

    def test_strong_force_establishes_grasp_and_holds(self):
        o0, o1, ns = grasp_update(self.s(0.5), jnp.asarray(0.2),
                                  self.f(5e4), self.THRESH)
        assert bool(ns.grasped)
        assert float(ns.current_openness) == pytest.approx(0.5)  # holds
        assert float(o1) == pytest.approx(0.5)

    def test_grasped_slipping_closes_slowly(self):
        # grasped, but force dropped below threshold (yet above release):
        # close by at most 0.05 per step
        o0, o1, ns = grasp_update(self.s(0.5, grasped=True), jnp.asarray(0.1),
                                  self.f(1e3), self.THRESH)
        assert float(ns.current_openness) == pytest.approx(0.45)

    def test_weak_force_releases_grasp(self):
        o0, o1, ns = grasp_update(self.s(0.5, grasped=True), jnp.asarray(0.1),
                                  self.f(10.0), self.THRESH)  # < 100 release
        assert not bool(ns.grasped)
        assert float(ns.current_openness) == pytest.approx(0.1)

    def test_one_finger_strong_not_enough(self):
        forces = jnp.array([[5e4, 0, 0], [10.0, 0, 0]])  # only one finger
        o0, o1, ns = grasp_update(self.s(0.5), jnp.asarray(0.2),
                                  forces, self.THRESH)
        assert not bool(ns.grasped)
        assert float(ns.current_openness) == pytest.approx(0.2)


class TestPhysTwinDynamics:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ckpt")
        pts = make_rope_points(n=80, length=0.3)
        write_fixture_checkpoint(root, "rope_test", pts)
        return root, pts

    def make_action(self, xyz, gripper=1.0):
        rot = np.diag([1.0, -1.0, -1.0])  # canonical downward eef
        a = np.concatenate([np.asarray(xyz), rot.reshape(-1), [gripper]])
        return jnp.asarray(a[None], jnp.float32)

    def state_for(self, x, eef_xyz):
        return {
            "x": jnp.asarray(x, jnp.float32),
            "eef_xyz": jnp.asarray([eef_xyz], jnp.float32),
            "eef_quat": jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
            "eef_gripper": jnp.asarray([[1.0]], jnp.float32),
        }

    def test_reset_and_free_fall(self, ckpt):
        root, pts = ckpt
        cfg = full_cfg(root, "rope_test",
                       physics_over=dict(self_collision=False))
        dyn = PhysTwinDynamics(cfg, ckpt_path=str(root), case_name="rope_test")
        pose = np.eye(4)
        pose[2, 3] = 0.1  # drop from 10cm
        aligned = dyn.reset(self.state_for(pts, [0.3, 0.0, 0.4]),
                            pose_obj=jnp.asarray(pose, jnp.float32))
        np.testing.assert_allclose(np.asarray(aligned),
                                   pts + [0, 0, 0.1], atol=1e-5)
        assert dyn.opts.num_substeps == 667  # round(1/30/5e-5)

        state = self.state_for(aligned, [0.3, 0.0, 0.4])
        eef = np.array([0.3, 0.0, 0.4])
        for i in range(12):
            state = dyn.step(state, self.make_action(eef))
        z = np.asarray(state["x"][:, 2])
        assert np.all(z > -0.01)
        assert np.abs(z).max() < 0.05  # rope fell to the ground and settled
        assert np.isfinite(np.asarray(state["v"])).all()
        assert float(state["current_openness"][0]) == pytest.approx(1.0)

    def test_joint_action_mode(self, ckpt):
        root, pts = ckpt
        cfg = full_cfg(root, "rope_test",
                       physics_over=dict(self_collision=False))
        dyn = PhysTwinDynamics(cfg, ckpt_path=str(root), case_name="rope_test")
        from real2sim_eval_tpu.kinematics import KinHelper
        import pathlib
        urdf = pathlib.Path("/root/reference/assets/robots/xarm/xarm7.urdf")
        if not urdf.exists():
            pytest.skip("reference assets unavailable")
        kh = KinHelper(str(urdf))
        aligned = dyn.reset(self.state_for(pts, [0.3, 0.0, 0.4]),
                            kin_helper=kh,
                            pose_obj=jnp.asarray(np.eye(4), jnp.float32))
        q = np.array([0, -45, 0, 30, 0, 75, 0]) * np.pi / 180
        action = jnp.asarray(np.concatenate([q, [0.0]])[None], jnp.float32)
        state = self.state_for(aligned, [0.2568, 0.0, 0.4005])
        out = dyn.step(state, action)
        assert "qpos" in out
        np.testing.assert_allclose(np.asarray(out["eef_xyz"][0]),
                                   [0.2568, 0.0, 0.4005], atol=2e-3)
        # joint-mode gripper flip: 1 - action[-1]
        assert float(out["eef_gripper"][0, 0]) == pytest.approx(1.0)

    def test_spring_count_mismatch_raises(self, tmp_path):
        pts = make_box_points(4, 0.05)
        write_fixture_checkpoint(tmp_path, "bad", pts)
        cfg = full_cfg(tmp_path, "bad",
                       physics_over=dict(object_radius=0.5))  # different topology
        dyn = PhysTwinDynamics(cfg, ckpt_path=str(tmp_path), case_name="bad")
        with pytest.raises(AssertionError, match="spring count"):
            dyn.reset({"x": pts}, pose_obj=jnp.asarray(np.eye(4), jnp.float32))

    @pytest.mark.slow
    def test_rigid_box_keeps_shape(self, tmp_path):
        """A densely-sprung box (the rigid-phystwin recipe) falls without
        losing its shape: pairwise extents preserved within a few percent."""
        pts = make_box_points(5, 0.06)
        write_fixture_checkpoint(tmp_path, "box", pts, radius=0.05,
                                 max_neighbours=40, spring_Y=1e5)
        cfg = full_cfg(tmp_path, "box",
                       physics_over=dict(self_collision=False,
                                         object_radius=0.05,
                                         object_max_neighbours=40))
        dyn = PhysTwinDynamics(cfg, ckpt_path=str(tmp_path), case_name="box")
        pose = np.eye(4)
        pose[2, 3] = 0.08
        aligned = dyn.reset(self.state_for(pts, [0.3, 0.0, 0.4]),
                            pose_obj=jnp.asarray(pose, jnp.float32))
        state = self.state_for(aligned, [0.3, 0.0, 0.4])
        for _ in range(10):
            state = dyn.step(state, self.make_action([0.3, 0.0, 0.4]))
        x = np.asarray(state["x"])
        extent = x.max(0) - x.min(0)
        np.testing.assert_allclose(extent, [0.06, 0.06, 0.06], atol=0.012)
        assert x[:, 2].min() > -0.01
