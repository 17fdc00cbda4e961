"""Golden-trajectory regression guard.

Future performance work must not silently change the dynamics: a fixed
fixture episode's particle trajectory is pinned here (CPU, float32). If an
intentional semantic change moves these numbers, regenerate with
``python tests/test_golden_trajectory.py``.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "rope_drop_trajectory.npz"


def _run_trajectory():
    from real2sim_eval_tpu.physics import PhysTwinDynamics
    from real2sim_eval_tpu.kinematics.robot import RobotModel
    from real2sim_eval_tpu.testing import BUILTIN_URDF
    from fixtures import full_cfg, make_rope_points, write_fixture_checkpoint
    import tempfile

    root = Path(tempfile.mkdtemp())
    rope = make_rope_points(n=120, length=0.3, seed=7)
    write_fixture_checkpoint(root, "golden_rope", rope, spring_Y=2e3)
    robot = RobotModel(BUILTIN_URDF, link_names=["left_finger", "right_finger"])
    cfg = full_cfg(root, "golden_rope",
                   physics_over=dict(dt=2e-4, grasp_force_threshold=3e3))
    dyn = PhysTwinDynamics(cfg, ckpt_path=str(root), case_name="golden_rope")
    pose = np.eye(4)
    pose[2, 3] = 0.05
    aligned = dyn.reset({"x": rope}, robot=robot,
                        pose_obj=jnp.asarray(pose, jnp.float32))

    rot = np.diag([1.0, -1.0, -1.0])
    state = {"x": aligned,
             "eef_xyz": jnp.asarray([[0.15, 0.0, 0.25]], jnp.float32),
             "eef_quat": jnp.asarray([[0.0, 1.0, 0.0, 0.0]], jnp.float32),
             "eef_gripper": jnp.asarray([[1.0]], jnp.float32)}
    eef = np.array([0.15, 0.0, 0.25])
    snapshots = []
    for i in range(6):
        eef = eef + [0.0, 0.0, -0.01]
        grip = max(0.0, 1.0 - i * 0.2)
        action = jnp.asarray(
            np.concatenate([eef, rot.reshape(-1), [grip]])[None], jnp.float32)
        state = dyn.step(state, action)
        snapshots.append(np.asarray(state["x"]))
    return np.stack(snapshots)


def test_golden_rope_drop():
    if not GOLDEN.exists():
        pytest.skip("golden file not generated yet")
    traj = _run_trajectory()
    golden = np.load(GOLDEN)["traj"]
    assert traj.shape == golden.shape
    # float32 across compiler versions: tight but not bit-exact
    np.testing.assert_allclose(traj, golden, atol=5e-5)


if __name__ == "__main__":
    import os
    import sys

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    GOLDEN.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDEN, traj=_run_trajectory())
    print(f"wrote {GOLDEN}")
