"""Synthetic scene/checkpoint fixtures for tests and benchmarks.

Plays the role the reference's rigid-phystwin creator plays for its users
(experiments/utils/create_rigid_phystwin.py): fabricate a complete PhysTwin
checkpoint from simple geometry, so the full pipeline runs without the
paper's released assets.
"""

from __future__ import annotations

import numpy as np

from real2sim_eval_tpu.config import ConfigNode
from real2sim_eval_tpu.physics import checkpoints as ckpt_io
from real2sim_eval_tpu.physics.topology import connect_springs


def make_rope_points(n=200, length=0.5, jitter=0.002, seed=0):
    """A slightly-jittered 3D rope: a line of points with small noise."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, length, n)
    pts = np.stack([t, np.zeros(n), np.zeros(n)], axis=-1)
    pts += rng.normal(scale=jitter, size=pts.shape)
    return pts.astype(np.float64)


def make_box_points(n_side=5, extent=0.06):
    """Dense grid filling a cube (a rigid-block stand-in)."""
    g = np.linspace(-extent / 2, extent / 2, n_side)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    return pts.astype(np.float64)


def write_fixture_checkpoint(root, case_name, points, radius=0.02,
                             max_neighbours=30, spring_Y=3e4, **kwargs):
    """Connect springs exactly like the runtime loader will, then write a
    checkpoint tree whose num_object_springs matches."""
    # connect on the float32 version — exactly what the loader reads back
    # (regular grids have distance ties whose ordering is dtype-sensitive)
    points = np.asarray(points, np.float32)
    springs, _ = connect_springs(points, radius, max_neighbours)
    ckpt_io.write_phystwin_checkpoint(
        root, case_name,
        object_points=points,
        surface_points=np.zeros((0, 3)),
        interior_points=np.zeros((0, 3)),
        spring_Y=np.full(len(springs), spring_Y, np.float32),
        num_object_springs=len(springs),
        **kwargs,
    )
    return springs


def physics_cfg(**overrides):
    """A physics config mirroring cfg/physics/default.yaml defaults."""
    base = dict(
        ckpt_path=None, case_name=None, use_graph=True,
        fps=30, dt=5e-5, num_substeps=667, duration=30,
        dashpot_damping=100, drag_damping=3,
        init_spring_Y=3e4, spring_Y_min=0, spring_Y_max=1e5,
        object_radius=0.02, object_max_neighbours=30,
        controller_radius=0.04, controller_max_neighbours=50,
        collide_elas=0.5, collide_fric=0.3,
        collide_self_elas=0.5, collide_self_fric=0.3,
        collide_eef_elas=0.0, collide_eef_fric=1.0,
        collision_requires_grad=True, self_collision=True,
        collision_dist=0.005, reverse_z=False,
        icp_threshold=0.02, use_lbs=True, precompute_relations=True,
        table_height=0.0, grasp_force_threshold=3e4,
        visualize_mesh_points=False, visualize_phystwin_points=False,
        visualize_eef_points=False,
    )
    base.update(overrides)
    return ConfigNode(base)


def env_cfg(use_pusher=False, **overrides):
    base = dict(
        sim=dict(frame_rate=30, duration=30),
        robot=dict(type="xarm", use_pusher=use_pusher, n_grippers=1, n_qpos=7,
                   init_gripper_openness=800,
                   init_eef_xyz=[0.2568, 0.0, 0.4005],
                   do_velocity_control=True),
        urdf=dict(
            ik_urdf_path="/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf",
            collision_urdf_path="/root/reference/assets/robots/xarm/xarm7_with_gripper_collision.urdf",
            collision_link_names=["left_finger", "right_finger"],
        ),
        cameras=[],
    )
    base.update(overrides)
    return ConfigNode(base)


def full_cfg(ckpt_path, case_name, use_pusher=False, physics_over=None):
    return ConfigNode(dict(
        seed=0,
        online=False,
        env_name="BaseEnv-v0",
        obs_mode="rgbd",
        exp_root="log/experiments",
        physics=physics_cfg(ckpt_path=str(ckpt_path), case_name=case_name,
                            **(physics_over or {})).to_dict(),
        env=env_cfg(use_pusher=use_pusher).to_dict(),
        gs=dict(use_shs=False, use_grid_randomization=False),
    ))
