"""BaseEnv: the gymnasium environment binding physics + renderer.

API parity with the reference's BaseEnv (sim/envs/env.py:12-108):
reset/get_obs/step/get_state/render/close with the same dict layouts, so
the reference's policy wrappers and success calculators work unchanged.
Arrays in observations are jnp (device) arrays; callers convert as needed.
"""

from __future__ import annotations

from pathlib import Path

import gymnasium as gym
import numpy as np

from ..physics import PhysTwinDynamics
from ..renderer import GSRenderer
from .registration import register_env


@register_env("BaseEnv-v0", max_episode_steps=2000)
class BaseEnv(gym.Env):

    def __init__(self, cfg, exp_root: str | Path = "log/experiments",
                 randomize: bool = False, local_rank: int = 0,
                 raster_config=None, **kwargs):
        self.cfg = cfg
        self.renderer = GSRenderer(cfg, local_rank, raster_config=raster_config)
        self.physics = PhysTwinDynamics(cfg, exp_root, cfg.physics.ckpt_path,
                                        cfg.physics.case_name, local_rank)
        self.randomize = randomize

    def reset(self, *, seed=None, options=None):
        super().reset(seed=None, options=options)
        np.random.seed(seed)
        skip_obs = bool(options and options.get("skip_obs"))
        self.renderer.load_scaniverse(randomize=self.randomize, index=seed)
        self.renderer.set_all_cameras()
        self.renderer.reset_state(visualize_image=False, skip_compose=skip_obs)

        state = self.renderer.get_state()
        phystwin_pts = self.physics.reset(
            state,
            init_meshes_dict=self.renderer.meshes_canonical,
            mesh_poses=self.renderer.mesh_poses,
            robot=self.renderer.robot,
            eef_pts_func=self.renderer.eef_pts_func,
            kin_helper=_KinAdapter(self.renderer),
            init_eef_xyz=self.renderer.init_eef_xyz,
            pose_obj=self.renderer.pose_obj,
        )
        self.renderer.update_phystwin_pts(phystwin_pts)
        if options and options.get("skip_obs"):
            return None, {}  # asset-building resets (batched eval) skip renders
        return self.get_obs(), {}

    def get_obs(self, render_extra: bool = False):
        state = self.renderer.get_state()
        im_list, depth_list = self.renderer.render_fixed_cameras()
        im_wrist_list, depth_wrist_list = self.renderer.render_wrist_cameras()
        im_extra = depth_extra = None
        if render_extra:
            im_extra, depth_extra = self.renderer.render()
        return {
            "image_list": im_list,
            "depth_list": depth_list,
            "image_wrist_list": im_wrist_list,
            "depth_wrist_list": depth_wrist_list,
            "image_extra": im_extra,
            "depth_extra": depth_extra,
            "robot": {
                "eef_xyz": state["eef_xyz"],
                "eef_quat": state["eef_quat"],
                "eef_gripper": state["eef_gripper"],
            },
        }

    def get_language_instruction(self):
        return None

    def render(self):
        return self.renderer.render()

    def close(self):
        return None

    def step(self, action_dict):
        state = self.renderer.get_state()
        action = action_dict["action"]
        if action_dict.get("do_velocity_control", True):
            action = self.renderer.mimic_velocity_control(action)
        state = self.physics.step(state, action)
        self.renderer.update_state(state)
        return None, None, None, None, None

    def get_state(self):
        renderer_state = self.renderer.get_state()
        physics_state = self.physics.get_state()
        return {
            "renderer": {"x": np.asarray(renderer_state["x"])},
            "physics": {
                "static_meshes": physics_state["static_meshes"],
                "init_springs": np.asarray(physics_state["init_springs"]),
            },
        }


class _KinAdapter:
    """Adapts GSRenderer's jitted kinematics to the kin_helper protocol
    PhysTwinDynamics expects (a chain + compute_fk/ik)."""

    def __init__(self, renderer: GSRenderer):
        self.chain = renderer.sample_robot.chain
        self._renderer = renderer

    def compute_ik_sapien(self, initial_qpos, cartesian):
        import jax.numpy as jnp

        from ..utils import transforms as tf

        target = np.eye(4, dtype=np.float32)
        target[:3, :3] = np.asarray(
            tf.euler_to_rot(jnp.asarray(cartesian[3:6], jnp.float32)))
        target[:3, 3] = cartesian[:3]
        return np.asarray(self._renderer._ik(
            jnp.asarray(np.asarray(initial_qpos, np.float32)),
            jnp.asarray(target)))
