"""End-to-end grasp-and-lift against the real xArm gripper geometry.

This is the framework's flagship interaction: SDF finger contact + grasp
hysteresis + friction must cooperate to pick up a soft body (the behavior the
reference's paper evaluates). Uses a coarser dt than production for CPU test
speed (stability verified: omega*dt < 0.5)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import full_cfg, make_box_points, write_fixture_checkpoint

pytestmark = pytest.mark.slow

COLLISION_URDF = Path(
    "/root/reference/assets/robots/xarm/xarm7_with_gripper_collision.urdf")


@pytest.mark.skipif(not COLLISION_URDF.exists(), reason="reference assets unavailable")
def test_grasp_and_lift_cube(tmp_path):
    from real2sim_eval_tpu.kinematics.robot import RobotModel
    from real2sim_eval_tpu.physics import PhysTwinDynamics

    pts = make_box_points(6, 0.04)
    write_fixture_checkpoint(tmp_path, "box", pts, radius=0.02,
                             max_neighbours=30, spring_Y=2e4)
    robot = RobotModel(str(COLLISION_URDF),
                       link_names=["left_finger", "right_finger"])
    cfg = full_cfg(tmp_path, "box",
                   physics_over=dict(grasp_force_threshold=3e3,
                                     dt=2e-4))  # 167 substeps per step
    dyn = PhysTwinDynamics(cfg, ckpt_path=str(tmp_path), case_name="box")
    pose = np.eye(4)
    pose[:3, 3] = [0.15, 0.0, 0.02]
    aligned = dyn.reset({"x": pts}, robot=robot,
                        pose_obj=jnp.asarray(pose, jnp.float32))
    assert dyn.opts.num_substeps == 167

    rot = np.diag([1.0, -1.0, -1.0])

    def act(xyz, g):
        return jnp.asarray(
            np.concatenate([xyz, rot.reshape(-1), [g]])[None], jnp.float32)

    state = {"x": aligned,
             "eef_xyz": jnp.asarray([[0.15, 0.0, 0.19]], jnp.float32),
             "eef_quat": jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
             "eef_gripper": jnp.asarray([[1.0]], jnp.float32)}
    eef = np.array([0.15, 0.0, 0.19])

    grip = 1.0
    for _ in range(16):  # close at the xArm's max gripper speed (2/30 per step)
        grip = max(0.0, grip - 2 / 30)
        state = dyn.step(state, act(eef, grip))
    assert bool(dyn.grasp_state.grasped), "squeeze should establish a grasp"
    held = float(state["current_openness"][0])
    assert held > 0.2, "grasp should hold openness above the command"

    z0 = float(state["x"][:, 2].mean())
    for _ in range(10):
        eef = eef + np.array([0.0, 0.0, 0.015])
        state = dyn.step(state, act(eef, grip))
    dz = float(state["x"][:, 2].mean()) - z0
    assert dz > 0.10, f"grasped cube should ride the lift, moved {dz:.3f}m"
    assert bool(dyn.grasp_state.grasped)
