import textwrap
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.kinematics import KinematicChain, make_ik_fn
from real2sim_eval_tpu.kinematics.ik import ik_damped_ls
from real2sim_eval_tpu.utils import transforms as tf
from real2sim_eval_tpu.utils.urdf import load_urdf

XARM7 = Path("/root/reference/assets/robots/xarm/xarm7.urdf")
XARM7_GRIPPER = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")


@pytest.fixture(scope="module")
def planar_urdf(tmp_path_factory):
    """Two-link planar arm: analytic FK known in closed form."""
    p = tmp_path_factory.mktemp("urdf") / "planar.urdf"
    p.write_text(textwrap.dedent("""
        <robot name="planar">
          <link name="base"/>
          <link name="l1"/>
          <link name="l2"/>
          <link name="tip"/>
          <joint name="j1" type="revolute">
            <origin rpy="0 0 0" xyz="0 0 0"/>
            <parent link="base"/><child link="l1"/>
            <axis xyz="0 0 1"/>
            <limit lower="-3.14" upper="3.14"/>
          </joint>
          <joint name="j2" type="revolute">
            <origin rpy="0 0 0" xyz="1 0 0"/>
            <parent link="l1"/><child link="l2"/>
            <axis xyz="0 0 1"/>
            <limit lower="-3.14" upper="3.14"/>
          </joint>
          <joint name="jt" type="fixed">
            <origin rpy="0 0 0" xyz="1 0 0"/>
            <parent link="l2"/><child link="tip"/>
          </joint>
        </robot>
    """))
    return p


def test_planar_fk(planar_urdf):
    chain = KinematicChain.from_urdf_file(planar_urdf)
    assert chain.n_dof == 2
    q = jnp.array([np.pi / 2, -np.pi / 2], jnp.float32)
    poses = chain.fk(q)
    tip = poses[chain.link_index("tip")]
    # elbow at (0,1), tip extends along rotated-back x: (1,1)
    np.testing.assert_allclose(tip[:3, 3], [1.0, 1.0, 0.0], atol=1e-5)

    tip2 = chain.fk_link(q, "tip")
    np.testing.assert_allclose(tip2, tip, atol=1e-6)


def test_planar_fk_batch(planar_urdf):
    chain = KinematicChain.from_urdf_file(planar_urdf)
    qs = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (16, 2)), jnp.float32)
    batched = jax.vmap(lambda q: chain.fk_link(q, "tip"))(qs)
    for i in range(16):
        single = chain.fk_link(qs[i], "tip")
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_planar_ik(planar_urdf):
    chain = KinematicChain.from_urdf_file(planar_urdf)
    q_true = jnp.array([0.7, -0.4], jnp.float32)
    target = chain.fk_link(q_true, "tip")
    q0 = jnp.array([0.5, -0.2], jnp.float32)
    q = ik_damped_ls(chain, "tip", q0, target, iters=50)
    reached = chain.fk_link(q, "tip")
    np.testing.assert_allclose(reached[:3, 3], target[:3, 3], atol=1e-3)


def test_planar_ik_fallback(planar_urdf):
    chain = KinematicChain.from_urdf_file(planar_urdf)
    # unreachable target (arm length 2, target at distance 5)
    target = jnp.eye(4).at[:3, 3].set(jnp.array([5.0, 0.0, 0.0]))
    q0 = jnp.array([0.3, 0.3], jnp.float32)
    q = ik_damped_ls(chain, "tip", q0, target, iters=30)
    np.testing.assert_allclose(q, q0, atol=1e-6)  # reference fallback contract


@pytest.mark.skipif(not XARM7.exists(), reason="reference assets unavailable")
class TestXarm7:
    @pytest.fixture(scope="class")
    def chain(self):
        return KinematicChain.from_urdf_file(XARM7)

    def test_structure(self, chain):
        assert chain.n_dof == 7
        assert "link7" in chain.link_names

    def test_home_pose(self, chain):
        """FK at zero qpos: xArm7 link origins stack along known offsets."""
        poses = chain.fk(jnp.zeros(7))
        tip = poses[chain.link_index("link7")]
        # At q=0 the arm is fully upright: x = 0.052+0.0775+0.076 etc.
        # Validate against the independent composition of URDF origins.
        model = load_urdf(XARM7)
        T = np.eye(4)
        name_to_joint = {j.child: j for j in model.joints}
        link = "link7"
        chain_path = []
        while link in name_to_joint:
            chain_path.append(name_to_joint[link])
            link = name_to_joint[link].parent
        for j in reversed(chain_path):
            T = T @ j.origin
        np.testing.assert_allclose(np.asarray(tip), T, atol=1e-5)

    def test_reference_init_qpos_fk(self, chain):
        """The reference's canonical init qpos (gs_renderer.py:71) should put
        the eef near its configured init_eef_xyz (cfg/env/xarm_gripper.yaml)."""
        q = jnp.asarray(np.array([0, -45, 0, 30, 0, 75, 0]) * np.pi / 180, jnp.float32)
        tip = chain.fk_link(q, "link7")
        np.testing.assert_allclose(
            np.asarray(tip[:3, 3]), [0.2568, 0.0, 0.4005], atol=2e-3
        )
        # pointing down: z axis of eef frame ~ -z world
        np.testing.assert_allclose(np.asarray(tip[:3, 2]), [0, 0, -1], atol=1e-2)

    def test_ik_roundtrip(self, chain):
        solve = jax.jit(make_ik_fn(chain, "link7", n_active=7, iters=40))
        q_init = jnp.asarray(np.array([0, -45, 0, 30, 0, 75, 0]) * np.pi / 180, jnp.float32)
        q_true = q_init + jnp.asarray(
            np.random.default_rng(1).uniform(-0.15, 0.15, 7), jnp.float32
        )
        target = chain.fk_link(q_true, "link7")
        q_sol = solve(q_init, target)
        reached = chain.fk_link(q_sol, "link7")
        assert np.linalg.norm(np.asarray(reached[:3, 3] - target[:3, 3])) < 5e-3
        assert np.linalg.norm(np.asarray(reached[:3, :3] - target[:3, :3])) < 1e-2


@pytest.mark.skipif(not XARM7_GRIPPER.exists(), reason="reference assets unavailable")
def test_gripper_urdf_link_ids():
    """Link document order must reproduce the reference's SAPIEN link ids
    (robot_pc_transformations.py:31-34: 18 links, 1=base, 2-8=arm, 10-16=fingers)."""
    model = load_urdf(XARM7_GRIPPER)
    assert len(model.links) == 18
    assert model.links[0].name == "world"
    assert model.links[1].name == "link_base"
    assert model.links[2].name == "link1"
    assert model.links[8].name == "link7"
    assert model.links[9].name == "link_eef"
    chain = KinematicChain.from_urdf(model)
    assert chain.n_dof == 13  # 7 arm + 6 finger joints (mimics kept as DOFs)


@pytest.mark.skipif(not XARM7_GRIPPER.exists(), reason="reference assets unavailable")
class TestXarmTransformAPI:
    """API-parity wrappers (robot_pc_transformations.py function surface)."""

    @pytest.fixture(scope="class")
    def robots(self):
        from real2sim_eval_tpu.kinematics.robot import RobotModel

        collision = Path(
            "/root/reference/assets/robots/xarm/xarm7_with_gripper_collision.urdf")
        sample = RobotModel(str(XARM7_GRIPPER))
        robot = RobotModel(str(collision),
                           link_names=["left_finger", "right_finger"])
        return sample, robot

    def test_transform_gs_gripper_moves_link_splats(self, robots):
        from real2sim_eval_tpu.kinematics.robot import CANONICAL_ARM_QPOS
        from real2sim_eval_tpu.kinematics.xarm_transforms import (
            transform_gs_xarm_gripper)

        sample, _ = robots
        rng = np.random.default_rng(0)
        n = 50
        params = {"means3D": rng.random((n, 3)).astype(np.float32),
                  "rotations": np.tile([[1, 0, 0, 0]], (n, 1)).astype(np.float32)}
        mask = np.zeros(n, np.int32)
        mask[:20] = 5  # link4 splats
        q = CANONICAL_ARM_QPOS.copy()
        out_same = transform_gs_xarm_gripper(q, 750.0, dict(params), mask,
                                             sample_robot=sample)
        np.testing.assert_allclose(np.asarray(out_same["means3D"]),
                                   params["means3D"], atol=1e-5)
        q2 = q.copy()
        q2[1] += 0.4
        out = transform_gs_xarm_gripper(q2, 750.0, dict(params), mask,
                                        sample_robot=sample)
        moved = np.linalg.norm(np.asarray(out["means3D"]) - params["means3D"],
                               axis=-1)
        assert moved[:20].min() > 1e-3   # masked splats moved
        assert moved[20:].max() < 1e-6   # others untouched

    def test_eef_pts_func_openness(self, robots):
        from real2sim_eval_tpu.kinematics import KinHelper
        from real2sim_eval_tpu.kinematics.robot import CANONICAL_ARM_QPOS
        from real2sim_eval_tpu.kinematics.xarm_transforms import (
            get_eef_pts_xarm_gripper)

        sample, robot = robots
        kh = KinHelper("/root/reference/assets/robots/xarm/xarm7.urdf")
        eef_xyz = np.array([0.2568, 0.0, 0.4005], np.float32)
        eef_quat = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
        pts, fn = get_eef_pts_xarm_gripper(
            eef_xyz, eef_quat, np.array([1.0]), robot, sample, kh,
            CANONICAL_ARM_QPOS)
        open_pts = fn(1.0)
        closed_pts = fn(0.0)
        assert open_pts.shape == closed_pts.shape
        # fingers near the eef, below it (z < eef z), and closing narrows y
        assert np.abs(open_pts[:, :2].mean(0) - eef_xyz[:2]).max() < 0.1
        spread_open = open_pts[:, 1].max() - open_pts[:, 1].min()
        spread_closed = closed_pts[:, 1].max() - closed_pts[:, 1].min()
        assert spread_closed < spread_open
