"""GSRenderer: scene state, splat loading, per-frame composition, rendering.

API-parity facade for the reference's renderer
(sim/renderer/gs_renderer.py:26-1166) on the TPU-native stack:

  - splat loading + color correction + randomization -> scene.py helpers
  - LBS sim->gaussian motion transfer -> lbs.py (precomputed weights)
  - robot splat articulation -> scene.RobotArticulation (gather, not loops)
  - rasterization -> raster.py (Pallas on TPU)
  - IK/FK -> kinematics (jitted JAX, no SAPIEN host round-trips)

State layout matches the reference (x/v in world frame, 14-wide gripper
rows: xyz, vel, quat, quat_vel, openness — gs_renderer.py:325-331).
Arrays at the facade boundary are numpy/jnp interchangeably.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics import KinematicChain, make_ik_fn
from ..kinematics.robot import CANONICAL_ARM_QPOS, RobotModel
from ..utils import transforms as tf
from ..utils import transforms_np as tnp
from ..utils.gs_processor import GSProcessor, activate_params
from ..utils.mesh import load_mesh
from ..utils.sh import C0
from . import lbs as lbs_mod
from .camera import (Camera, Rt_to_w2c, default_orbit_intrinsics,
                     orbit_camera_w2c, setup_camera, wrist_w2c)
from .raster import RasterConfig, rasterize
from .scene import (RobotArticulation, XARM_GRIPPER_LINK_IDS,
                    XARM_PUSHER_LINK_IDS, apply_random_pose,
                    correct_sh_colors, grid_random_values,
                    transform_params_by_pose, uniform_random_values)

N_SIM_PARTICLES = 1000   # downsampled sim-particle count (gs_renderer.py:239)


class GSRenderer:

    def __init__(self, cfg, local_rank: int = 0,
                 raster_config: RasterConfig | None = None):
        self.cfg = cfg
        self.online = bool(cfg.get("online", False))
        self.raster_config = raster_config or RasterConfig()

        self.metadata: dict = {}
        self.metadata_wrist: dict = {}
        self.state = {"x": None, "v": None, "x_his": None, "v_his": None,
                      "color": None}
        self.rendervar: dict = {}
        self.rendervar_full: dict = {}
        self.table_rendervar: dict = {}
        self.params_meshes: dict = {}
        self.meshes: dict = {}
        self.grippers = np.zeros((0, 14), np.float32)
        self.random_variables: list = []

        self.qpos_curr_xarm = CANONICAL_ARM_QPOS.copy()
        self.gripper_openness_curr_xarm = 800.0

        self.cameras: list = []
        self.wrist_cameras: list = []

        self.sp = GSProcessor()
        self.relations = None
        self.weights = None

        self.visualize_mesh_points = bool(cfg.physics.visualize_mesh_points)
        self.visualize_phystwin_points = bool(cfg.physics.visualize_phystwin_points)
        self.visualize_eef_points = bool(cfg.physics.visualize_eef_points)

        urdf_cfg = cfg.env["urdf"]
        self.sample_robot = RobotModel(urdf_cfg["ik_urdf_path"])
        self.robot = RobotModel(urdf_cfg["collision_urdf_path"],
                                link_names=list(urdf_cfg["collision_link_names"]))
        self.use_pusher = bool(cfg.env["robot"]["use_pusher"])
        # pusher configs set this to null (cfg/env/xarm_pusher.yaml) — the
        # value is only consumed on the gripper path (gs_renderer.py:101-102)
        self.init_gripper_openness_xarm = float(
            cfg.env["robot"].get("init_gripper_openness") or 0.0)

        # jitted kinematics on the articulated chain
        chain = self.sample_robot.chain
        self._ik_chain = chain
        eef_idx = chain.link_index(
            "link7" if "link7" in chain.link_names else chain.link_names[-1])
        self._eef_idx = eef_idx
        n_dof = chain.n_dof

        def _full_q(q7):
            if n_dof > 7:
                return jnp.concatenate([q7, jnp.zeros((n_dof - 7,), q7.dtype)])
            return q7

        self._ik = jax.jit(make_ik_fn(chain, eef_idx, n_active=7))
        self._fk_eef = jax.jit(lambda q7: chain.fk_link(_full_q(q7), eef_idx))
        self._full_q_np = lambda q7: np.concatenate(
            [q7, np.zeros(n_dof - 7)]) if n_dof > 7 else np.asarray(q7)

        self.viser_viewer = None
        if self.online:
            from ..utils.viser_gui import ViserViewer

            self.viser_viewer = ViserViewer(port=int(cfg.get("viser_port", 6789)))

        seed = int(cfg.get("seed", 0))
        self._rng = np.random.RandomState(seed)

        self._frame_fn = None  # jitted composition, built per scene

    # ------------------------------------------------------------------
    # cameras (gs_renderer.py:107-221)
    # ------------------------------------------------------------------

    def set_all_cameras(self):
        cfg = self.cfg
        self.cameras = []
        self.wrist_cameras = []
        for camera_cfg in cfg.env.cameras:
            h, w = int(camera_cfg.h), int(camera_cfg.w)
            intr = np.array(camera_cfg.intr, np.float32).reshape(3, 3)
            if "c2w" in camera_cfg:
                extr = np.linalg.inv(
                    np.array(camera_cfg.c2w, np.float32).reshape(4, 4))
            else:
                extr = np.array(camera_cfg.w2c, np.float32).reshape(4, 4)
            if camera_cfg.type == "side":
                self.cameras.append([w, h, intr, extr])
            else:
                assert camera_cfg.type == "wrist"
                self.wrist_cameras.append([w, h, intr, extr])

        rcfg = self.cfg.renderer
        self.set_camera_custom(tuple(rcfg.gs_center), float(rcfg.gs_distance),
                               float(rcfg.gs_elevation), float(rcfg.gs_azimuth))
        if self.wrist_cameras:
            w, h, intr, eef2c = self.wrist_cameras[0]
            self.set_wrist_camera(w, h, intr, eef2c)

    def set_camera_custom(self, center=(0, 0, 0), distance=0.8,
                          elevation=20.0, azimuth=160.0, near=0.01, far=100.0):
        w2c = orbit_camera_w2c(center, distance, elevation, azimuth)
        w, h = 848, 480
        self.metadata = {"w": w, "h": h, "k": default_orbit_intrinsics(w, h),
                         "w2c": w2c, "near": near, "far": far}

    def set_wrist_camera(self, w, h, intr, eef2c=None, R=None, t=None,
                         near=0.01, far=100.0):
        if eef2c is None:
            eef2c = Rt_to_w2c(R, t)
        self.metadata_wrist = {"w": w, "h": h, "k": intr, "eef2c": eef2c,
                               "near": near, "far": far}

    def update_camera(self, k, w2c, w=None, h=None, near=0.01, far=100.0):
        self.metadata.update({"k": k, "w2c": w2c, "near": near, "far": far})
        if w is not None:
            self.metadata["w"] = w
        if h is not None:
            self.metadata["h"] = h

    # ------------------------------------------------------------------
    # scene loading (gs_renderer.py:333-715)
    # ------------------------------------------------------------------

    def _load_corrected(self, path, color_cfg) -> dict:
        """Load a splat PLY, apply color correction, activate."""
        from ..utils.ply import sh_colors_to_coeffs

        raw = self.sp.load(path)
        coeffs = sh_colors_to_coeffs(raw["sh_colors"])
        if color_cfg is not None and "color_A" in color_cfg:
            coeffs = correct_sh_colors(coeffs, color_cfg["color_A"],
                                       color_cfg["color_b"])
        raw = dict(raw, sh_colors=coeffs)
        return activate_params(raw)

    def load_scaniverse(self, randomize=False, index=None):
        cfg = self.cfg
        self.random_variables = []

        use_grid = bool(cfg.gs.get("use_grid_randomization", False))
        true_index = index
        true_index_mesh = None
        if randomize and use_grid:
            obj_grid = cfg.gs.object.grid_randomization
            n_obj = (len(obj_grid.xy) if obj_grid.one_to_one
                     else len(obj_grid.xy) * len(obj_grid.theta))
            assert index is not None
            true_index_mesh = index // n_obj
            true_index = index % n_obj

        # --- attached meshes + their splats (gs_renderer.py:352-503) ---
        params_meshes, meshes = {}, {}
        self.meshes_canonical = {}
        self.mesh_poses = {}
        for mesh_obj in cfg.gs.get("meshes", []):
            name = mesh_obj["name"]
            mesh = load_mesh(mesh_obj["mesh_path"])
            pose = np.array(mesh_obj["pose"], np.float64).reshape(4, 4)

            if randomize and use_grid and mesh_obj.get("grid_randomization"):
                g = mesh_obj.grid_randomization
                n_this = (len(g.xy) if g.one_to_one
                          else len(g.xy) * len(g.theta))
                idx_this = true_index_mesh % n_this
                true_index_mesh = true_index_mesh // n_this
                rand = grid_random_values(idx_this, g.xy, g.theta, g.one_to_one)
                pose = apply_random_pose(pose, rand)
                self.random_variables.append(list(rand))
            elif randomize and not use_grid:
                # global np.random: BaseEnv.reset seeds it per episode
                # (reference env.py:32), making draws reproducible by seed
                rand = uniform_random_values(
                    np.random, mesh_obj["translation_range"],
                    mesh_obj["azimuth_range"])
                pose = apply_random_pose(pose, rand)
                self.random_variables.append(list(rand))

            params = self._load_corrected(mesh_obj["splat_path"], mesh_obj)
            params = transform_params_by_pose(params, pose)
            self.meshes_canonical[name] = mesh.copy()
            self.mesh_poses[name] = pose
            mesh.transform(pose)
            params_meshes[name] = params
            meshes[name] = mesh
        self.params_meshes = params_meshes
        self.meshes = meshes

        # --- scene (table + robot) splat + link mask (:505-507) --------
        scene_cfg = cfg.gs["scene"]
        table = self._load_corrected(scene_cfg["table_splat_path"], scene_cfg)
        self.total_mask_full = np.load(scene_cfg["total_mask_path"]).astype(np.int32)
        self.table_rendervar = table

        # --- robot init + eef tables (:509-527) -------------------------
        robot_cfg = cfg.env["robot"]
        init_quat = list(robot_cfg.get("init_quat", [0, 1, 0, 0]))
        init_gripper = list(robot_cfg.get("init_gripper", [1.0]))
        eef_xyz = np.array(robot_cfg["init_eef_xyz"], np.float32).reshape(-1, 3)
        eef_quat = np.array(init_quat, np.float32).reshape(-1, 4)
        eef_gripper = np.array(init_gripper, np.float32).reshape(-1, 1)
        self.set_eef(eef_xyz, eef_quat, eef_gripper,
                     eef_xyz_next=eef_xyz, eef_quat_next=eef_quat)
        self.init_eef_xyz = eef_xyz.copy()
        self.init_eef_quat = eef_quat.copy()

        # eef point table in the eef frame; the world-frame function mirrors
        # the reference's interp1d closure (robot_pc_transformations.py:190)
        self._eef_table = self.robot.eef_points_table()   # (101, P, 3) eef frame
        R_init = tnp.quat_to_rot(eef_quat[0])
        t_init = eef_xyz[0]

        def eef_pts_func(openness: float) -> np.ndarray:
            o = float(np.clip(openness, 0.0, 1.0)) * 100.0
            i0 = int(min(np.floor(o), 99))
            frac = o - i0
            pts = (1 - frac) * self._eef_table[i0] + frac * self._eef_table[i0 + 1]
            return pts @ R_init.T + t_init

        self.eef_pts_func = eef_pts_func
        self.eef_pts = eef_pts_func(float(eef_gripper[0, 0]))

        # --- object splat (:529-646) ------------------------------------
        obj_cfg = cfg.gs["object"]
        obj = self._load_corrected(obj_cfg["path"], obj_cfg)
        pose_obj = np.array(obj_cfg["pose"], np.float64).reshape(4, 4)
        if randomize and use_grid:
            g = cfg.gs.object.grid_randomization
            rand = grid_random_values(true_index, g.xy, g.theta, g.one_to_one)
            pose_obj = apply_random_pose(pose_obj, rand)
            self.random_variables.append(list(rand))
        elif randomize:
            rand = uniform_random_values(np.random, obj_cfg["translation_range"],
                                         obj_cfg["azimuth_range"])
            pose_obj = apply_random_pose(pose_obj, rand)
            self.random_variables.append(list(rand))
        self.pose_obj_np = np.asarray(pose_obj, np.float32)
        self.pose_obj = jnp.asarray(pose_obj, jnp.float32)
        self.rendervar = transform_params_by_pose(obj, pose_obj)

        # --- articulation tables ----------------------------------------
        link_ids = (XARM_PUSHER_LINK_IDS if self.use_pusher
                    else XARM_GRIPPER_LINK_IDS)
        link_ids = tuple(i for i in link_ids
                         if i < len(self.sample_robot.chain.link_names))
        n_extra = self.sample_robot.chain.n_dof - 7
        if n_extra > 0:
            # reference default init_gripper = 750 counts
            # (robot_pc_transformations.py:13); counts -> rad: (800-g)*0.001
            init_g = (self.init_gripper_openness_xarm
                      if self.init_gripper_openness_xarm > 0 else 750.0)
            ang = (800.0 - init_g) * 0.001
            base_q = np.concatenate([CANONICAL_ARM_QPOS, np.full(n_extra, ang)])
        else:
            base_q = CANONICAL_ARM_QPOS.copy()
        # articulation depends only on the urdf + init gripper counts, and
        # _build_frame_fn jits a closure over it: build ONCE so repeated
        # episode resets (the reference rebuilds env per episode,
        # eval_policy.py:56-66) reuse the compiled frame function
        if getattr(self, "articulation", None) is not None:
            self.relations = None
            self.weights = None
            return
        self.articulation = RobotArticulation.build(
            self.sample_robot, link_ids, base_q, use_pusher=self.use_pusher)

        self._build_frame_fn()
        self.relations = None
        self.weights = None

    # ------------------------------------------------------------------
    # state (gs_renderer.py:223-331, 1050-1097)
    # ------------------------------------------------------------------

    def reset_state(self, visualize_image: bool = False,
                    skip_compose: bool = False):
        xyz0 = np.asarray(self.rendervar["means3D"])
        color0 = np.asarray(self.rendervar["shs"])[:, 0] * C0 + 0.5
        n = min(N_SIM_PARTICLES, len(xyz0))
        self.state["x"] = jnp.asarray(xyz0[:n])
        self.state["v"] = jnp.zeros((n, 3), jnp.float32)
        self.state["color"] = jnp.asarray(color0[:n])
        if skip_compose:
            return  # batched eval composes its own frames
        self.update_rendervar()
        if visualize_image:
            im, depth = self.render()
            self._dump_debug_images(im, depth)

    def _dump_debug_images(self, im, depth):
        import cv2

        im_vis = (np.asarray(im).transpose(1, 2, 0) * 255).astype(np.uint8)[:, :, ::-1]
        cv2.imwrite("test.png", im_vis)
        d = np.asarray(depth)
        mask = d < 15
        if mask.any():
            dv = cv2.applyColorMap(
                cv2.convertScaleAbs(d, alpha=255 / d[mask].max()), cv2.COLORMAP_JET)
            dv[~mask] = 0
            cv2.imwrite("test_depth.png", dv)

    def get_state(self):
        g = self.grippers
        return {
            "x": self.state["x"],
            "v": self.state["v"],
            "eef_xyz": g[:, :3].copy(),
            "eef_vel": g[:, 3:6].copy(),
            "eef_quat": g[:, 6:10].copy(),
            "eef_quat_vel": g[:, 10:13].copy(),
            "eef_gripper": g[:, 13:].copy(),
            "color": self.state["color"],
        }

    def set_eef(self, eef_xyz, eef_quat, eef_gripper, eef_xyz_next=None,
                eef_vel=None, eef_quat_next=None, eef_quat_vel=None):
        fps = float(self.cfg.physics.fps)
        eef_xyz = np.asarray(eef_xyz, np.float32).reshape(-1, 3)
        eef_quat = np.asarray(eef_quat, np.float32).reshape(-1, 4)
        eef_gripper = np.asarray(eef_gripper, np.float32).reshape(-1, 1)
        if eef_xyz_next is not None:
            eef_vel = (np.asarray(eef_xyz_next, np.float32).reshape(-1, 3)
                       - eef_xyz) * fps
        if eef_quat_next is not None:
            # host-side math: a device round-trip here costs seconds on the
            # tunnel runtime and this runs per reset/step
            R_this = tnp.quat_to_rot(eef_quat)
            R_next = tnp.quat_to_rot(
                np.asarray(eef_quat_next, np.float32).reshape(-1, 4))
            delta = R_this @ np.linalg.inv(R_next)
            eef_quat_vel = tnp.rot_to_axis_angle(delta) * fps
        n_g = int(self.cfg.env.robot.n_grippers)
        g = np.zeros((n_g, 14), np.float32)
        g[:, :3] = eef_xyz
        g[:, 3:6] = eef_vel
        g[:, 6:10] = eef_quat
        g[:, 10:13] = eef_quat_vel
        g[:, 13:] = eef_gripper
        self.grippers = g

    def update_phystwin_pts(self, phystwin_pts):
        self.state["x"] = jnp.asarray(phystwin_pts)

    def update_state(self, state):
        """Consume a physics next_state dict (gs_renderer.py:1054-1097)."""
        if "qpos" in state and state["qpos"] is not None:
            qpos = np.asarray(state["qpos"], np.float32)
            eef_xyz, eef_quat = self.compute_fk(qpos)
            eef_gripper = 1.0 - qpos[:, -1:]
            prev_q = self.grippers[:, 6:10].copy()
            prev_xyz = self.grippers[:, :3].copy()
            R_prev = tnp.quat_to_rot(prev_q)
            R_this = tnp.quat_to_rot(eef_quat)
            aa = tnp.rot_to_axis_angle(R_prev @ np.linalg.inv(R_this))
            fps = float(self.cfg.physics.fps)
            self.set_eef(eef_xyz, eef_quat, eef_gripper,
                         eef_vel=(eef_xyz - prev_xyz) * fps,
                         eef_quat_vel=aa * fps)
            if "current_openness" in state:
                self.grippers[:, 13:] = np.asarray(
                    state["current_openness"], np.float32).reshape(-1, 1)
            self.update_rendervar(state["x"], qpos_now=qpos)
        else:
            g = self.grippers
            g[:, :3] = np.asarray(state["eef_xyz"], np.float32)
            if "eef_vel" in state and state["eef_vel"] is not None:
                g[:, 3:6] = np.asarray(state["eef_vel"], np.float32)
            if state.get("eef_quat") is not None:
                g[:, 6:10] = np.asarray(state["eef_quat"], np.float32)
                if "eef_quat_vel" in state and state["eef_quat_vel"] is not None:
                    g[:, 10:13] = np.asarray(state["eef_quat_vel"], np.float32)
                g[:, 13:] = np.asarray(state["eef_gripper"], np.float32)
            if "current_openness" in state:
                g[:, 13:] = np.asarray(state["current_openness"],
                                       np.float32).reshape(-1, 1)
            self.update_rendervar(state["x"])
        self.state["x"] = jnp.asarray(state["x"])
        self.state["v"] = jnp.asarray(state["v"])

    # ------------------------------------------------------------------
    # frame composition (gs_renderer.py:717-921)
    # ------------------------------------------------------------------

    def _build_frame_fn(self):
        """Jit the full-scene composition: LBS + articulation + concat."""
        art = self.articulation
        use_lbs = bool(self.cfg.physics.use_lbs)

        def compose(obj_means, obj_quats, bones, bones_pred,
                    relations, weights, weights_indices,
                    table_means, table_quats, mask,
                    arm_qpos, openness_counts):
            if use_lbs:
                xyz, quat = lbs_mod.interpolate_motions(
                    bones, bones_pred - bones, relations, weights,
                    weights_indices, obj_means, quat=None)
            else:
                xyz = lbs_mod.simple_apply(weights, weights_indices, bones_pred)
            quat = obj_quats
            q_full = art.full_qpos(arm_qpos, openness_counts)
            t_means, t_quats = art.apply(q_full, table_means, table_quats, mask)
            return xyz, quat, t_means, t_quats

        self._frame_fn = jax.jit(compose)

    def knn_relations(self, bones):
        return np.asarray(lbs_mod.knn_relations(jnp.asarray(bones)))

    def knn_weights(self, bones, pts):
        w, i = lbs_mod.knn_weights(jnp.asarray(bones), jnp.asarray(pts))
        return w, i

    def update_rendervar(self, x_pred=None, gripper_now=None, qpos_now=None):
        rv = self.rendervar
        obj_means = jnp.asarray(rv["means3D"])
        obj_quats = jnp.asarray(rv["rotations"])
        bones = self.state["x"]

        if x_pred is None:
            bones_pred = bones
        else:
            bones_pred = jnp.asarray(x_pred)

        if self.relations is None:
            self.relations = lbs_mod.knn_relations(bones)
            if bool(self.cfg.physics.use_lbs):
                self.weights = lbs_mod.knn_weights(bones, obj_means)
            else:
                self.weights = lbs_mod.simple_weights(bones, obj_means)
        weights, weights_indices = self.weights

        # qpos for the robot splats (IK from eef pose unless given,
        # gs_renderer.py:827-849)
        if qpos_now is None:
            g = self.grippers if gripper_now is None else np.asarray(gripper_now)
            eef_xyz = g[0, :3]
            eef_rot = tnp.quat_to_rot(g[0, 6:10])
            target = np.eye(4, dtype=np.float32)
            target[:3, :3] = eef_rot
            target[:3, 3] = eef_xyz
            qpos7 = np.asarray(self._ik(
                jnp.asarray(self.qpos_curr_xarm, jnp.float32),
                jnp.asarray(target)))[:7]
            openness_counts = float(g[0, 13]) * 800.0
        else:
            qpos7 = np.asarray(qpos_now, np.float32)[0, :7]
            g = self.grippers if gripper_now is None else np.asarray(gripper_now)
            openness_counts = float(g[0, 13]) * 800.0

        xyz, quat, t_means, t_quats = self._frame_fn(
            obj_means, obj_quats, bones, bones_pred,
            self.relations, weights, weights_indices,
            jnp.asarray(self.table_rendervar["means3D"]),
            jnp.asarray(self.table_rendervar["rotations"]),
            jnp.asarray(self.total_mask_full),
            jnp.asarray(qpos7, jnp.float32),
            jnp.asarray(openness_counts, jnp.float32))

        parts_means = [xyz]
        parts_shs = [jnp.asarray(rv["shs"])]
        parts_quats = [quat]
        parts_opac = [jnp.asarray(rv["opacities"])]
        parts_scales = [jnp.asarray(rv["scales"])]

        for name, pm in self.params_meshes.items():
            parts_means.append(jnp.asarray(pm["means3D"]))
            parts_shs.append(jnp.asarray(pm["shs"]))
            parts_quats.append(jnp.asarray(pm["rotations"]))
            parts_opac.append(jnp.asarray(pm["opacities"]))
            parts_scales.append(jnp.asarray(pm["scales"]))

        parts_means.append(t_means)
        parts_shs.append(jnp.asarray(self.table_rendervar["shs"]))
        parts_quats.append(t_quats)
        parts_opac.append(jnp.asarray(self.table_rendervar["opacities"]))
        parts_scales.append(jnp.asarray(self.table_rendervar["scales"]))

        self.rendervar_full = {
            "means3D": jnp.concatenate(parts_means, 0),
            "shs": _pad_cat_sh(parts_shs),
            "rotations": jnp.concatenate(parts_quats, 0),
            "opacities": jnp.concatenate(parts_opac, 0),
            "scales": jnp.concatenate(parts_scales, 0),
        }
        self.qpos_curr_xarm = np.asarray(qpos7, np.float64)
        self.gripper_openness_curr_xarm = openness_counts

    # ------------------------------------------------------------------
    # rendering (gs_renderer.py:923-1048)
    # ------------------------------------------------------------------

    def _render_with(self, w, h, intr, w2c, near, far, bg):
        rd = self.rendervar_full
        assert rd, "update_rendervar first"
        cam, w2c = setup_camera(w, h, intr, w2c, near, far, z_threshold=0.05)
        sh_deg = (int(np.sqrt(rd["shs"].shape[1]) - 1)
                  if self.cfg.gs.get("use_shs", False) else 0)
        shs = rd["shs"] if sh_deg > 0 else rd["shs"][:, :1]
        im, depth = rasterize(cam, jnp.asarray(w2c), rd["means3D"], rd["scales"],
                              rd["rotations"], rd["opacities"], shs, sh_deg,
                              bg=tuple(bg), config=self.raster_config)
        return jnp.clip(im, 0.0, 1.0), depth

    def render(self, render_data=None, bg=(0.0, 0.0, 0.0), camera=None):
        if camera is not None:
            w, h, k, w2c = camera
        else:
            m = self.metadata
            w, h, k, w2c = m["w"], m["h"], m["k"], m["w2c"]
        m = self.metadata or {"near": 0.01, "far": 100.0}
        return self._render_with(w, h, k, w2c, m.get("near", 0.01),
                                 m.get("far", 100.0), bg)

    def render_wrist(self, render_data=None, bg=(0.0, 0.0, 0.0), camera=None):
        if camera is not None:
            w, h, k, eef2c = camera
        else:
            m = self.metadata_wrist
            w, h, k, eef2c = m["w"], m["h"], m["k"], m["eef2c"]
        g = self.grippers
        eef_rot = tnp.quat_to_rot(g[0, 6:10])
        w2c = wrist_w2c(eef2c, g[0, :3], eef_rot)
        mw = self.metadata_wrist or {}
        return self._render_with(w, h, k, w2c, mw.get("near", 0.01),
                                 mw.get("far", 100.0), bg)

    def render_fixed_cameras(self):
        ims, depths = [], []
        for camera in self.cameras:
            im, d = self.render(camera=camera)
            ims.append(im)
            depths.append(d)
        return ims, depths

    def render_wrist_cameras(self):
        ims, depths = [], []
        for camera in self.wrist_cameras:
            im, d = self.render_wrist(camera=camera)
            ims.append(im)
            depths.append(d)
        return ims, depths

    def render_online(self, render_data=None, bg=(0.0, 0.0, 0.0)):
        assert self.viser_viewer is not None
        meta = self.viser_viewer.get_metadata()
        if not meta:
            return
        im, _ = self.render(camera=[meta["w"], meta["h"], meta["k"], meta["w2c"]])
        self.viser_viewer.set_output(
            {"image": (np.asarray(im).transpose(1, 2, 0) * 255).astype(np.uint8)})
        self.viser_viewer.update()

    # ------------------------------------------------------------------
    # kinematics passthroughs (gs_renderer.py:1099-1166)
    # ------------------------------------------------------------------

    def compute_fk(self, joint_commands):
        q = np.asarray(joint_commands, np.float64)
        robot = self.sample_robot
        eef_name = ("link7" if "link7" in robot.chain.link_names
                    else robot.chain.link_names[self._eef_idx])
        xyzs, quats = [], []
        for i in range(q.shape[0]):
            T = robot.link_pose(robot.full_qpos(q[i, :7], openness=1.0), eef_name)
            xyzs.append(T[:3, 3])
            quats.append(tnp.rot_to_quat(T[:3, :3]))
        return (np.stack(xyzs).astype(np.float32),
                np.stack(quats).astype(np.float32))

    def mimic_velocity_control(self, action):
        """Position-command -> joint-velocity smoothing
        (gs_renderer.py:1115-1166), with jitted IK/FK."""
        action = np.asarray(action, np.float32)
        assert action.shape == (1, 13)
        target = np.eye(4, dtype=np.float32)
        target[:3, :3] = action[0, 3:12].reshape(3, 3)
        target[:3, 3] = action[0, 0:3]
        qpos = np.asarray(self._ik(
            jnp.asarray(self.qpos_curr_xarm, jnp.float32), jnp.asarray(target)))[:7]

        delta = qpos - self.qpos_curr_xarm[:7]
        norm = np.linalg.norm(delta)
        if norm > 0.10:
            delta = delta / norm * 0.10
        dt = 1.0 / 30.0
        v = delta / 0.02 * 0.15
        new_qpos = self.qpos_curr_xarm[:7] + v * dt

        robot = self.sample_robot
        eef_name = ("link7" if "link7" in robot.chain.link_names
                    else robot.chain.link_names[self._eef_idx])
        T = robot.link_pose(robot.full_qpos(new_qpos, openness=1.0), eef_name)
        action = action.copy()
        action[0, 0:3] = T[:3, 3]
        action[0, 3:12] = T[:3, :3].reshape(-1)

        current_g = self.gripper_openness_curr_xarm / 800.0
        delta_g = float(action[0, 12]) - current_g
        delta_g = np.clip(delta_g, -2.0 / 30.0, 2.0 / 30.0)
        action[0, 12] = current_g + delta_g
        return jnp.asarray(action)


def _pad_cat_sh(parts):
    """Concatenate SH coeff tensors with differing band counts by
    zero-padding to the max K."""
    kmax = max(int(p.shape[1]) for p in parts)
    out = []
    for p in parts:
        if p.shape[1] < kmax:
            p = jnp.pad(p, ((0, 0), (0, kmax - p.shape[1]), (0, 0)))
        out.append(p)
    return jnp.concatenate(out, 0)
