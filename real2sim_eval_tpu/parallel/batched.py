"""Batched (vmapped) episode evaluation on one chip or a device mesh.

The TPU-native replacement for the reference's multi-GPU fan-out
(experiments/eval_policy_parallel.py:242-293): instead of one OS process per
GPU re-building the env per episode, B randomized episodes share one set of
scene assets and step in lockstep inside a single jitted function.

Key structural fact exploited: grid/uniform randomization moves the object
and attached meshes RIGIDLY (gs_renderer.py:342-405). Under a rigid
transform, spring topology, rest lengths, resting pairs, LBS weights and
relations are all invariant — so every per-episode quantity except poses
and dynamic state is shared, and per-env memory is O(particles), not
O(gaussians).

Layout:
  shared   : splat attribute arrays, spring tables, SDF grids, LBS weights
  per-env  : object pose delta (4,4), static mesh poses, particle x/v,
             grasp state, 14-wide eef rows

The policy step runs on stacked (B, ...) observations; artifact writing
gathers to host per env.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kinematics import make_ik_fn
from ..physics.dynamics import GraspState
from ..physics.spring_mass import SpringMassParams, SpringMassState, MeshColliderSet
from ..renderer import lbs as lbs_mod
from ..renderer.camera import Camera, setup_camera, wrist_w2c_jax
from ..renderer.raster import RasterConfig, rasterize
from ..utils import transforms as tf


def _highest_precision(fn):
    """Trace-time f32 matmul precision for the physics/kinematics/LBS
    paths: their 3x3 rotation products, 6x6 IK solves, and bone
    -neighborhood contractions carry real values that the TPU MXU rounds
    to bf16 at default precision (SURVEY §7: force highest for
    SVD/physics — the CPU oracle parity tests are f32). The dots are
    tiny, so the 3-pass split is free; the render pipeline's big 0/1
    indicator dots are NOT wrapped (bf16-exact already)."""
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


@struct.dataclass
class BatchedState:
    sm: SpringMassState           # leaves (B, ...)
    grasp: GraspState             # leaves (B,)
    grippers: jax.Array           # (B, 14)
    qpos7: jax.Array              # (B, 7) current IK arm pose
    rel_pose: jax.Array           # (B, 4, 4) object pose delta vs env 0
    static_pose: jax.Array        # (B, M, 4, 4)
    rest_x: jax.Array             # (B, N, 3)
    step: jax.Array               # () int


class BatchedEvaluator:
    """Build once from a cfg + episode id list, then step/render batched."""

    def __init__(self, cfg, episode_ids, raster_config: RasterConfig | None = None,
                 max_render_gaussians: int | None = None,
                 physics_backend: str = "auto"):
        import real2sim_eval_tpu.envs as envs

        self.cfg = cfg
        self.episode_ids = list(episode_ids)
        B = len(self.episode_ids)
        self.raster_config = raster_config or RasterConfig()
        self.physics_backend = physics_backend

        env = envs.make(cfg.env_name, max_episode_steps=10 ** 9, cfg=cfg,
                        randomize=True, exp_root=cfg.get("exp_root", "log"),
                        raster_config=self.raster_config)
        self._env = env

        rest_x, sm_x, static_poses, rel_poses, grippers, rvars = \
            [], [], [], [], [], []
        self._static_mesh_dumps = []
        pose0_inv = None
        for i, ep in enumerate(self.episode_ids):
            env.reset(seed=ep, options={"skip_obs": True})
            phys = env.unwrapped.physics
            rend = env.unwrapped.renderer
            self._static_mesh_dumps.append(
                [{"vertices": m.vertices.copy(), "faces": m.faces.copy()}
                 for m in phys.init_meshes.values()] if phys.init_meshes else [])
            pose = phys.host_cache["static_pose"]
            obj_pose = np.asarray(rend.pose_obj_np, np.float64)
            if i == 0:
                pose0_inv = np.linalg.inv(obj_pose)
                self.params = phys.params
                self.colliders = phys.colliders
                self.opts = phys.opts
                self.finger_centroids = phys.finger_centroids
                self.global_translation = phys.global_translation
                self.force_threshold = float(cfg.physics.grasp_force_threshold)
                self._snapshot_scene(rend)
            rest_x.append(phys.host_cache["rest_x"])
            sm_x.append(phys.host_cache["rest_x"])
            static_poses.append(pose)
            rel_poses.append((obj_pose @ pose0_inv).astype(np.float32))
            grippers.append(rend.grippers[0].copy())
            rvars.append(list(rend.random_variables))
        self.random_variables = rvars

        n = sm_x[0].shape[0]
        self.state = BatchedState(
            sm=SpringMassState(
                x=jnp.asarray(np.stack(sm_x)),
                v=jnp.zeros((B, n, 3), jnp.float32),
                finger_forces=jnp.zeros((B, self.opts.n_fingers, 3), jnp.float32),
                telemetry=jnp.zeros((B, 4), jnp.int32),
            ),
            grasp=GraspState(
                current_openness=jnp.ones((B,), jnp.float32),
                grasped=jnp.zeros((B,), bool),
                initialized=jnp.zeros((B,), bool),
            ),
            grippers=jnp.asarray(np.stack(grippers)),
            qpos7=jnp.tile(jnp.asarray(self._qpos0, jnp.float32)[None], (B, 1)),
            rel_pose=jnp.asarray(np.stack(rel_poses)),
            static_pose=jnp.asarray(np.stack(static_poses)),
            rest_x=jnp.asarray(np.stack(rest_x)),
            step=jnp.asarray(0),
        )
        self.render_telemetry = None
        self._build_fns()

    # ------------------------------------------------------------------

    def _snapshot_scene(self, rend):
        """Shared scene arrays from episode 0 (canonical frame = episode 0)."""
        rv = rend.rendervar
        self.obj_means0 = jnp.asarray(rv["means3D"])
        self.obj_quats0 = jnp.asarray(rv["rotations"])
        self.obj_shs = jnp.asarray(rv["shs"])
        self.obj_scales = jnp.asarray(rv["scales"])
        self.obj_opac = jnp.asarray(rv["opacities"])

        self.bones0 = jnp.asarray(rend.state["x"])
        self.relations = lbs_mod.knn_relations(self.bones0)
        self.weights = lbs_mod.knn_weights(self.bones0, self.obj_means0)

        self.table = {k: jnp.asarray(v) for k, v in rend.table_rendervar.items()}
        self.mask = jnp.asarray(rend.total_mask_full)
        self.articulation = rend.articulation
        self.mesh_params = {k: {kk: jnp.asarray(vv) for kk, vv in p.items()}
                            for k, p in rend.params_meshes.items()}
        self._qpos0 = rend.qpos_curr_xarm[:7]
        self.use_shs = bool(rend.cfg.gs.get("use_shs", False))

        self.cameras = list(rend.cameras)
        self.wrist_cameras = list(rend.wrist_cameras)
        self._ik = make_ik_fn(rend.sample_robot.chain,
                              rend.sample_robot.chain.link_index("link7"),
                              n_active=7)
        self._chain = rend.sample_robot.chain
        self._fps = float(self.cfg.physics.fps)

    # ------------------------------------------------------------------

    def _build_fns(self):
        opts = self.opts
        has_coll = bool(self.colliders.fingers or self.colliders.statics)
        params0 = self.params
        colliders0 = self.colliders
        centroids = self.finger_centroids
        g_trans = jnp.asarray(self.global_translation)
        fps = self._fps
        B = self.batch_size

        from ..physics.dynamics import make_ctrl_builder
        from ..physics.pallas_step import make_pallas_step_fn, supports_pallas
        from ..physics.spring_mass import make_step_fn

        build_ctrl = make_ctrl_builder(opts, self.force_threshold)

        def env_pre(static_pose, sm, grasp, grippers, action):
            """Per-env eef bookkeeping + grasp machine -> SubstepControls."""
            colliders = colliders0.replace(static_pose=static_pose)
            eef_xyz = grippers[:3]
            eef_quat = grippers[6:10]
            eef_rot = tf.quat_to_rot(eef_quat)
            eef_xyz_next = action[:3]
            eef_rot_next = action[3:12].reshape(3, 3)
            openness_cmd = action[12]

            exyz = eef_xyz + g_trans
            exyz_next = eef_xyz_next + g_trans
            eef_vel = (exyz_next - exyz) * fps
            rot_delta = eef_rot @ jnp.linalg.inv(eef_rot_next)
            eef_rot_vel = tf.rot_to_axis_angle(rot_delta) * fps

            ctrl, grasp, openness_end = build_ctrl(
                colliders, sm, grasp, exyz, eef_rot, eef_vel, eef_rot_vel,
                openness_cmd, centroids)
            quat_next = tf.rot_to_quat(eef_rot_next)
            new_grippers = jnp.concatenate([
                eef_xyz_next, eef_vel, quat_next, eef_rot_vel,
                openness_end[None]])
            return ctrl, grasp, new_grippers

        backend = self.physics_backend
        if backend == "auto":
            backend = ("pallas" if (supports_pallas(opts, params0)
                                    and jax.default_backend() == "tpu")
                       else "xla")
        assert backend in ("pallas", "xla"), backend
        if backend == "pallas" and not supports_pallas(opts, params0):
            raise ValueError("pallas physics backend requested but the "
                             "topology/budgets don't support it")
        self.physics_backend_resolved = backend

        if backend == "pallas":
            pal_step = make_pallas_step_fn(
                opts, params0, colliders0 if has_coll else None, batch=B,
                interpret=jax.default_backend() != "tpu")

            @jax.jit
            @_highest_precision
            def step(state: BatchedState, actions: jax.Array) -> BatchedState:
                ctrl_b, grasp, grippers = jax.vmap(env_pre)(
                    state.static_pose, state.sm, state.grasp,
                    state.grippers, actions)
                sm = pal_step(params0, state.static_pose, state.rest_x,
                              state.sm, ctrl_b)
                return state.replace(sm=sm, grasp=grasp, grippers=grippers,
                                     step=state.step + 1)
        else:
            step_fn = make_step_fn(opts, has_colliders=has_coll)

            def env_step(rest_x, static_pose, sm, grasp, grippers, action):
                ctrl, grasp, new_grippers = env_pre(
                    static_pose, sm, grasp, grippers, action)
                params = params0.replace(rest_x=rest_x)
                colliders = colliders0.replace(static_pose=static_pose)
                sm = step_fn(params, colliders, sm, ctrl)
                return sm, grasp, new_grippers

            @jax.jit
            @_highest_precision
            def step(state: BatchedState, actions: jax.Array) -> BatchedState:
                sm, grasp, grippers = jax.vmap(env_step)(
                    state.rest_x, state.static_pose, state.sm, state.grasp,
                    state.grippers, actions)
                return state.replace(sm=sm, grasp=grasp, grippers=grippers,
                                     step=state.step + 1)

        self._step = step

        # ---------------- frame composition + render -------------------
        art = self.articulation
        mask = self.mask
        table = self.table
        mesh_params = self.mesh_params
        obj = (self.obj_means0, self.obj_quats0, self.obj_shs,
               self.obj_scales, self.obj_opac)
        bones0 = self.bones0
        relations = self.relations
        weights, weights_idx = self.weights
        sh_deg = (int(np.sqrt(self.obj_shs.shape[1]) - 1)
                  if self.use_shs else 0)
        rcfg = self.raster_config
        ik = self._ik

        def compose(rel_pose, x_pred, grippers, qpos7_prev):
            means0, quats0, shs0, scales0, opac0 = obj
            # canonical (env-0-frame) object gaussians -> this env's frame
            R = rel_pose[:3, :3]
            t = rel_pose[:3, 3]
            means = means0 @ R.T + t
            dq = tf.rot_to_quat(R)
            quats = tf.quat_multiply(dq[None], quats0)
            bones = bones0 @ R.T + t

            xyz, _ = lbs_mod.interpolate_motions(
                bones, x_pred - bones, relations, weights, weights_idx, means)

            # robot splats: IK on the eef pose
            eef_rot = tf.quat_to_rot(grippers[6:10])
            target = tf.make_se3(eef_rot, grippers[:3])
            qpos7 = ik(qpos7_prev, target)[:7]
            openness_counts = grippers[13] * 800.0
            q_full = art.full_qpos(qpos7, openness_counts)
            t_means, t_quats = art.apply(q_full, table["means3D"],
                                         table["rotations"], mask)

            parts_means = [xyz]
            parts_shs = [shs0]
            parts_quats = [quats]
            parts_opac = [opac0]
            parts_scales = [scales0]
            for name, pm in mesh_params.items():
                parts_means.append(pm["means3D"])
                parts_shs.append(pm["shs"])
                parts_quats.append(pm["rotations"])
                parts_opac.append(pm["opacities"])
                parts_scales.append(pm["scales"])
            parts_means.append(t_means)
            parts_shs.append(table["shs"])
            parts_quats.append(t_quats)
            parts_opac.append(table["opacities"])
            parts_scales.append(table["scales"])
            scene = {
                "means3D": jnp.concatenate(parts_means, 0),
                "shs": jnp.concatenate(parts_shs, 0),
                "rotations": jnp.concatenate(parts_quats, 0),
                "opacities": jnp.concatenate(parts_opac, 0),
                "scales": jnp.concatenate(parts_scales, 0),
            }
            return scene, qpos7

        def render_one(scene, cam: Camera, w2c):
            shs = scene["shs"] if sh_deg > 0 else scene["shs"][:, :1]
            im, depth = rasterize(cam, w2c, scene["means3D"], scene["scales"],
                                  scene["rotations"], scene["opacities"],
                                  shs, sh_deg, config=rcfg)
            return jnp.clip(im, 0.0, 1.0), depth

        fixed_cams = [(setup_camera(w, h, k, w2c)) for w, h, k, w2c
                      in self.cameras]
        wrist_cams = [(Camera(width=w, height=h, fx=float(k[0][0]),
                              fy=float(k[1][1]), cx=float(k[0][2]),
                              cy=float(k[1][2])), jnp.asarray(e, jnp.float32))
                      for w, h, k, e in self.wrist_cameras]

        self._compose = jax.jit(_highest_precision(jax.vmap(compose)))

        raster_backend = rcfg.backend
        if raster_backend == "auto":
            raster_backend = ("pallas" if jax.default_backend() == "tpu"
                              else "reference")
        uniform_res = len({(c.height, c.width)
                           for c, _ in fixed_cams + wrist_cams}) <= 1

        # ---- static/dynamic partition for incremental fixed-cam rendering
        # (renderer/incremental.py): object + robot-link splats are the only
        # gaussians that move for a fixed camera; meshes and the mask-0 scan
        # splats are constant across envs AND steps
        mask_np = np.asarray(self.mask)
        robot_rows = jnp.asarray(np.where(mask_np > 0)[0], jnp.int32)
        static_rows = jnp.asarray(np.where(mask_np <= 0)[0], jnp.int32)
        n_static = (int(static_rows.shape[0])
                    + sum(int(pm["means3D"].shape[0])
                          for pm in mesh_params.values()))
        use_incremental = (
            raster_backend == "pallas" and uniform_res and bool(fixed_cams)
            and n_static > 0 and rcfg.incremental != "off"
            and (rcfg.incremental == "on"
                 or jax.default_backend() == "tpu"))

        @_highest_precision
        def compose_dyn(rel_pose, x_pred, grippers, qpos7_prev):
            """Dynamic gaussians only: LBS object + articulated robot."""
            means0, quats0, shs0, scales0, opac0 = obj
            R = rel_pose[:3, :3]
            t = rel_pose[:3, 3]
            means = means0 @ R.T + t
            dq = tf.rot_to_quat(R)
            quats = tf.quat_multiply(dq[None], quats0)
            bones = bones0 @ R.T + t
            xyz, _ = lbs_mod.interpolate_motions(
                bones, x_pred - bones, relations, weights, weights_idx,
                means)
            eef_rot = tf.quat_to_rot(grippers[6:10])
            target = tf.make_se3(eef_rot, grippers[:3])
            qpos7 = ik(qpos7_prev, target)[:7]
            parts = {
                "means3D": [xyz], "shs": [shs0], "rotations": [quats],
                "opacities": [opac0], "scales": [scales0],
            }
            if robot_rows.shape[0]:
                openness_counts = grippers[13] * 800.0
                q_full = art.full_qpos(qpos7, openness_counts)
                r_means, r_quats = art.apply(
                    q_full, table["means3D"][robot_rows],
                    table["rotations"][robot_rows], mask[robot_rows])
                parts["means3D"].append(r_means)
                parts["rotations"].append(r_quats)
                for k in ("shs", "opacities", "scales"):
                    parts[k].append(table[k][robot_rows])
            scene = {k: (jnp.concatenate(v, 0) if len(v) > 1 else v[0])
                     for k, v in parts.items()}
            return scene, qpos7

        def static_scene():
            """Constant gaussians in [meshes..., mask-0 scan] order."""
            parts = {k: [] for k in ("means3D", "shs", "rotations",
                                     "opacities", "scales")}
            for name, pm in mesh_params.items():
                for k in parts:
                    parts[k].append(pm[k])
            if static_rows.shape[0]:
                for k in parts:
                    parts[k].append(table[k][static_rows])
            return {k: jnp.concatenate(v, 0) for k, v in parts.items()}

        # ---- init-time budget calibration (renderer/calibrate.py): every
        # raster buffer is static-shaped, so measure each camera family's
        # pair/grant demand on the INITIAL composed state and size budgets
        # from demand x margin instead of fixed factors. Families: wrist
        # full pipeline, fixed+wrist one-launch (non-incremental), static
        # build, and the per-step dynamic binning of the incremental merge.
        rcfg_wrist = rcfg_mixed = rcfg_static = rcfg_dyn = rcfg
        t_budget, p_mix = rcfg.dirty_budget, rcfg.mix_pairs
        dyn0 = None
        use_cull = use_dcull = False
        dyn_cap = 0
        calibrating = (rcfg.auto_budgets and raster_backend == "pallas"
                       and (fixed_cams or wrist_cams))
        if calibrating:
            from ..renderer import calibrate as cal
            from ..renderer import precull as pc
            from ..renderer.raster import TILE_H, TILE_W

            st0 = self.state
            scenes0, _ = self._compose(st0.rel_pose, st0.sm.x, st0.grippers,
                                       st0.qpos7)
            n_all = scenes0["means3D"].shape[1]
            eef_rot0 = jax.vmap(tf.quat_to_rot)(st0.grippers[:, 6:10])
            wlist0 = [(cam, jax.vmap(wrist_w2c_jax, in_axes=(None, 0, 0))(
                eef2c, st0.grippers[:, :3], eef_rot0))
                for cam, eef2c in wrist_cams]
            flist0 = [(cam, jnp.broadcast_to(
                jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))
                for cam, w2c in fixed_cams]
            if use_incremental:
                dyn0, _ = jax.jit(jax.vmap(compose_dyn))(
                    st0.rel_pose, st0.sm.x, st0.grippers, st0.qpos7)
                n_dyn0 = dyn0["means3D"].shape[1]
                sscene = static_scene()
            # ---- wrist static pre-cull (renderer/precull.py): the wrist
            # camera re-runs the full pipeline every step; compacting the
            # static scene to its camera-visible blocks makes preprocess,
            # slot emission, and the pair sort scale with visible count
            # instead of N (pixel-exact — tests/test_precull.py)
            use_cull = (use_incremental and bool(wlist0)
                        and rcfg.wrist_precull != "off"
                        and sscene["means3D"].shape[0] >= 16 * pc.BLOCK)
            # ---- eef-offset pose sweep, shared by cull-capacity AND
            # wrist pair-budget planning: every wrist budget must cover
            # the EPISODE's swept wrist poses, not just the init pose — a
            # manipulation eef lifts/translates, and a lifted wrist sees
            # far more of the scene (measured on the bench scene: 724
            # blocks visible at init vs 1215 at +0.2 m). The round-4
            # headline recorded 6,930 wrist binning drops precisely
            # because the pair budget was calibrated at init while the
            # mimic walked the eef to its target (VERDICT round-4 item 2).
            def swept_wlist(cams_eef2c):
                out = []
                for dx, dy, dz in ((0, 0, 0.1), (0, 0, 0.2), (0, 0, -0.1),
                                   (0.15, 0, 0), (-0.15, 0, 0),
                                   (0, 0.15, 0), (0, -0.15, 0)):
                    g_off = st0.grippers[:, :3] + jnp.asarray(
                        [dx, dy, dz], jnp.float32)
                    out.extend(
                        (cam, jax.vmap(wrist_w2c_jax,
                                       in_axes=(None, 0, 0))(
                            eef2c, g_off, eef_rot0))
                        for cam, eef2c in cams_eef2c)
                return out

            if use_cull:
                st_w = pc.pad_static_scene(pc.spatial_sort_scene(sscene))
                cull_centers, cull_radii = pc.block_bounds(
                    st_w["means3D"], st_w["scales"])
                # plan capacity over the union — margin 1.15 over the
                # sweep max (vs 1.5 over init alone)
                sweep = list(wlist0) + swept_wlist(wrist_cams)
                cull_cap = max(
                    pc.plan_static_cull(wlist0, cull_centers, cull_radii),
                    pc.plan_static_cull(sweep, cull_centers, cull_radii,
                                        margin=1.15))
                g_blocks = st_w["means3D"].shape[0] // pc.BLOCK
                # a capacity near the whole scene wins nothing — the
                # gather + concat would be pure overhead
                if (rcfg.wrist_precull == "auto"
                        and cull_cap >= int(0.9 * g_blocks)):
                    use_cull = False
            # ---- dynamic-side wrist cull (VERDICT round-4 item 4): the
            # LBS'd object + robot splats rode the full wrist pipeline
            # every step regardless of visibility; block-cull them per
            # step from POSED bounds (precull.cull_dynamic_blocks — the
            # spheres re-derive from the means the LBS already
            # materialized, one O(N) reduce per env/cam). Same 0.9
            # auto-disable: on scenes where the wrist sees ~the whole
            # object (the bench headline), the gather would be overhead.
            use_dcull = (use_cull
                         and dyn0["means3D"].shape[1] >= 16 * pc.BLOCK)
            dyn_cap = 0
            if use_dcull:
                dyn0_pad = pc.pad_dynamic_scene(dyn0)
                dyn_cap = max(
                    pc.plan_dynamic_cull(wlist0, dyn0_pad),
                    pc.plan_dynamic_cull(swept_wlist(wrist_cams),
                                         dyn0_pad, margin=1.15))
                g_dyn = dyn0_pad["means3D"].shape[1] // pc.BLOCK
                if (rcfg.wrist_precull == "auto"
                        and dyn_cap >= int(0.9 * g_dyn)):
                    use_dcull = False
            # wrist-family base config: the wrist full pipeline may run a
            # different compositor kernel than the fixed cameras (on-chip
            # A/B picks per family); calibration dispatches on .kernel
            rcfg_w0 = rcfg
            if rcfg.wrist_kernel not in ("inherit", rcfg.kernel):
                rcfg_w0 = dataclasses.replace(rcfg,
                                              kernel=rcfg.wrist_kernel)
            if use_cull:
                # per-camera culled scenes diverge, so each wrist camera
                # gets its own calibrated budget plan. Pair demand is
                # measured over the SWEPT poses on the FULL composed scene
                # (identical demand: culled-away splats are
                # frustum-invalid, so they count zero pairs either way),
                # then planned at the culled width the runtime bins over.
                rcfg_wrist = []
                for (cam_i, w2c0_b), (_, eef2c_i) in zip(wlist0,
                                                         wrist_cams):
                    cams_meas = ([(cam_i, w2c0_b)]
                                 + swept_wlist([(cam_i, eef2c_i)]))
                    # plan at the width the runtime actually bins over —
                    # statically known: cull_static_blocks compacts to
                    # min(cap, blocks) * BLOCK rows (no device pass needed)
                    g_st = st_w["means3D"].shape[0] // pc.BLOCK
                    n_run = (dyn0["means3D"].shape[1]
                             + min(cull_cap, g_st) * pc.BLOCK)
                    if use_dcull:
                        n_run = (dyn_cap + cull_cap) * pc.BLOCK
                    rcfg_wrist.append(cal.measure_and_plan(
                        rcfg_w0, cams_meas, scenes0, sh_deg,
                        n_run, rcfg.chunk))
            elif wlist0:
                rcfg_wrist = cal.measure_and_plan(
                    rcfg_w0, wlist0 + swept_wlist(wrist_cams), scenes0,
                    sh_deg, n_all, rcfg.chunk)
            if not use_incremental and (fixed_cams or wrist_cams):
                rcfg_mixed = cal.measure_and_plan(
                    rcfg, flist0 + wlist0 + swept_wlist(wrist_cams),
                    scenes0, sh_deg, n_all, rcfg.chunk)
            if use_incremental:
                sflist = [(cam, jnp.asarray(w2c, jnp.float32)[None])
                          for cam, w2c in fixed_cams]
                sscene_b = {k: v[None] for k, v in sscene.items()}
                rcfg_dyn = cal.measure_and_plan(rcfg, flist0, dyn0, sh_deg,
                                                n_dyn0, 8)
                # static builds clamp their dense block from below (>= 8,
                # one-time cost) — plan within that domain
                rcfg_static = cal.measure_and_plan(
                    rcfg, sflist, sscene_b, sh_deg,
                    sscene["means3D"].shape[0], rcfg.chunk,
                    wide_tiers=(8, 12, 16), small_floor=8)

        if use_incremental:
            from ..renderer.raster import rasterize_batch
            if rcfg.kernel == "fine":
                from ..renderer.incremental_fine import (
                    build_static_raster_fine as build_static_raster,
                    render_incremental_fine as render_incremental)
            else:
                from ..renderer.incremental import (build_static_raster,
                                                    render_incremental)

            st_scene = static_scene()
            cam_static = [
                (cam, build_static_raster(cam, jnp.asarray(w2c, jnp.float32),
                                          st_scene, sh_deg, rcfg_static),
                 w2c)
                for cam, w2c in fixed_cams]

            if calibrating:
                # mix budgets need the TRUNCATED static segments, so they
                # calibrate after the static rasters exist: per env/cam,
                # bin the initial dynamic scene with the calibrated dyn
                # budgets and measure the STATIC-FILL demand (sum of
                # truncated static segments over dirty tiles — since the
                # sort-based merge, dynamic pairs always fit their
                # binning buffer and p_mix sizes only the static fill)
                from ..renderer.binning import bin_gaussians
                from ..renderer.preprocess import preprocess_gaussians

                dshs0 = (dyn0["shs"] if sh_deg > 0
                         else dyn0["shs"][:, :, :1])
                n_dirty_mx = mix_mx = dynp_mx = 0
                if rcfg.kernel == "fine":
                    mp_d = (rcfg_dyn.fine_pairs_override
                            or int(rcfg.fine_pairs_factor * n_dyn0))
                else:
                    mp_d = (rcfg_dyn.max_pairs_override
                            or int(rcfg.max_pairs_factor * n_dyn0))
                mp_d = -(-mp_d // 8) * 8
                for cam, static, w2c in cam_static:
                    def one_mix(means, scales, quats, opac, sh, _cam=cam,
                                _st=static,
                                _w2c=jnp.asarray(w2c, jnp.float32)):
                        pre = preprocess_gaussians(
                            _cam, _w2c, means, scales, quats, opac, sh,
                            sh_deg)
                        if rcfg.kernel == "fine":
                            # dirtiness is per FINE tile: only dirty fine
                            # tiles re-walk their static segment (clean
                            # lanes pass the cache through —
                            # incremental_fine._merge_one_env_fine)
                            from ..renderer.binning_fine import \
                                bin_gaussians_fine
                            bins = bin_gaussians_fine(
                                pre, _st.n_super_x, _st.n_super_y, mp_d,
                                small_tiles=rcfg_dyn.fine_small_tiles,
                                max_tiles_per_gaussian=(
                                    rcfg_dyn.fine_max_tiles),
                                max_large=rcfg_dyn.max_large,
                                pack_payloads=False)
                            cnt_d = (bins["fine_ends"]
                                     - bins["fine_starts"])
                            n_sup = _st.n_super_x * _st.n_super_y
                            dirty_s = jnp.sum(
                                cnt_d.reshape(n_sup, 8), axis=1) > 0
                            dirty_f = cnt_d > 0
                            len_s = jnp.where(dirty_f,
                                              _st.ends - _st.starts, 0)
                            return (jnp.sum(dirty_s.astype(jnp.int32)),
                                    jnp.sum(len_s),
                                    jnp.sum(cnt_d))
                        bins = bin_gaussians(
                            pre, _st.n_tiles_x, _st.n_tiles_y,
                            TILE_W, TILE_H, mp_d,
                            rcfg_dyn.max_tiles_per_gaussian,
                            small_tiles=rcfg_dyn.small_tiles,
                            max_large=rcfg_dyn.max_large,
                            pack_payloads=False,
                            mid_tiles=rcfg_dyn.mid_tiles,
                            max_mid=rcfg_dyn.max_mid)
                        cnt_d = bins["tile_ends"] - bins["tile_starts"]
                        dirty = cnt_d > 0
                        len_s = jnp.where(dirty, _st.ends - _st.starts, 0)
                        return (jnp.sum(dirty.astype(jnp.int32)),
                                jnp.sum(len_s), jnp.sum(cnt_d))
                    nd, mx, dp = jax.jit(jax.vmap(one_mix))(
                        dyn0["means3D"], dyn0["scales"], dyn0["rotations"],
                        dyn0["opacities"], dshs0)
                    n_dirty_mx = max(n_dirty_mx, int(jax.device_get(
                        jnp.max(nd))))
                    mix_mx = max(mix_mx, int(jax.device_get(jnp.max(mx))))
                    dynp_mx = max(dynp_mx, int(jax.device_get(
                        jnp.max(dp))))
                t_budget, p_mix = cal.plan_mix_budgets(
                    None, dynp_mx, n_dirty_mx, mix_mx)
            # exposed for on-chip golden checks (bench.py --check)
            self._incremental_debug = {
                "cam_static": cam_static, "static_scene": st_scene,
                "compose_dyn": jax.jit(jax.vmap(compose_dyn)),
                "sh_deg": sh_deg, "kind": rcfg.kernel,
                "rcfg_dyn": rcfg_dyn, "t_budget": t_budget, "p_mix": p_mix,
            }

            @jax.jit
            def render(state: BatchedState):
                dyn, qpos_new = jax.vmap(compose_dyn)(
                    state.rel_pose, state.sm.x, state.grippers, state.qpos7)
                B = state.sm.x.shape[0]
                rgb_f, dep_f, tele = render_incremental(
                    cam_static, dyn, sh_deg, rcfg_dyn,
                    t_budget=t_budget, p_mix=p_mix)
                ims = jnp.swapaxes(rgb_f, 0, 1)
                depths = jnp.swapaxes(dep_f, 0, 1)
                if wrist_cams and use_cull:
                    from ..renderer import precull as pc
                    eef_rot = jax.vmap(tf.quat_to_rot)(state.grippers[:, 6:10])
                    dyn_pad = pc.pad_dynamic_scene(dyn) if use_dcull else dyn
                    wims_l, wdep_l, wdrop_l = [], [], []
                    for i, (cam, eef2c) in enumerate(wrist_cams):
                        w2c_b = jax.vmap(wrist_w2c_jax, in_axes=(None, 0, 0))(
                            eef2c, state.grippers[:, :3], eef_rot)
                        culled, ovf = pc.cull_static_blocks(
                            cam, w2c_b, st_w, cull_centers, cull_radii,
                            cull_cap)
                        if use_dcull:
                            dyn_c, ovf_d = pc.cull_dynamic_blocks(
                                cam, w2c_b, dyn_pad, dyn_cap)
                            ovf = ovf + ovf_d
                        else:
                            dyn_c = dyn
                        sc = {k: jnp.concatenate([dyn_c[k], culled[k]],
                                                 axis=1) for k in dyn}
                        rgb_w, dep_w, wd = rasterize_batch(
                            [(cam, w2c_b)], sc, sh_deg,
                            config=rcfg_wrist[i], return_drops=True)
                        wims_l.append(rgb_w[0])
                        wdep_l.append(dep_w[0])
                        # capacity overflow drops whole 64-splat blocks —
                        # count them into the loud wrist drop lane
                        wdrop_l.append(wd[0] + ovf * pc.BLOCK)
                    wims = jnp.swapaxes(jnp.stack(wims_l), 0, 1)
                    wdepths = jnp.swapaxes(jnp.stack(wdep_l), 0, 1)
                    wdrop = jnp.stack(wdrop_l)
                elif wrist_cams:
                    # wrist moves with the eef: full pipeline on the
                    # [dynamic; static] concatenation (the same global
                    # order the incremental merge reproduces)
                    scenes = {k: jnp.concatenate(
                        [dyn[k], jnp.broadcast_to(
                            st_scene[k][None], (B,) + st_scene[k].shape)],
                        axis=1) for k in st_scene}
                    eef_rot = jax.vmap(tf.quat_to_rot)(state.grippers[:, 6:10])
                    wlist = []
                    for cam, eef2c in wrist_cams:
                        w2c_b = jax.vmap(wrist_w2c_jax, in_axes=(None, 0, 0))(
                            eef2c, state.grippers[:, :3], eef_rot)
                        wlist.append((cam, w2c_b))
                    rgb_w, dep_w, wdrop = rasterize_batch(
                        wlist, scenes, sh_deg, config=rcfg_wrist,
                        return_drops=True)
                    wims = jnp.swapaxes(rgb_w, 0, 1)
                    wdepths = jnp.swapaxes(dep_w, 0, 1)
                else:
                    wims = jnp.zeros((B, 0, 1, 1))
                    wdepths = jnp.zeros((B, 0, 1, 1))
                    wdrop = jnp.zeros((0, B), jnp.int32)
                return ims, depths, wims, wdepths, qpos_new, (tele, wdrop)
        elif raster_backend == "pallas" and uniform_res and (fixed_cams
                                                             or wrist_cams):
            # batched pipeline: vmapped compose + binning, ONE compositor
            # grid over (env, camera, tile) — no per-env serialization
            from ..renderer.raster import rasterize_batch

            @jax.jit
            def render(state: BatchedState):
                scenes, qpos_new = jax.vmap(compose)(
                    state.rel_pose, state.sm.x, state.grippers, state.qpos7)
                B = state.sm.x.shape[0]
                cam_list = [(cam, jnp.broadcast_to(
                    jnp.asarray(w2c, jnp.float32)[None], (B, 4, 4)))
                    for cam, w2c in fixed_cams]
                eef_rot = jax.vmap(tf.quat_to_rot)(state.grippers[:, 6:10])
                for cam, eef2c in wrist_cams:
                    w2c_b = jax.vmap(wrist_w2c_jax, in_axes=(None, 0, 0))(
                        eef2c, state.grippers[:, :3], eef_rot)
                    cam_list.append((cam, w2c_b))
                rgb, depth, drops = rasterize_batch(cam_list, scenes, sh_deg,
                                                    config=rcfg_mixed,
                                                    return_drops=True)
                nf = len(fixed_cams)
                ims = jnp.swapaxes(rgb[:nf], 0, 1)
                depths = jnp.swapaxes(depth[:nf], 0, 1)
                if wrist_cams:
                    wims = jnp.swapaxes(rgb[nf:], 0, 1)
                    wdepths = jnp.swapaxes(depth[nf:], 0, 1)
                else:
                    wims = jnp.zeros((B, 0, 1, 1))
                    wdepths = jnp.zeros((B, 0, 1, 1))
                if not fixed_cams:
                    ims = jnp.zeros((B, 0, 1, 1))
                    depths = jnp.zeros((B, 0, 1, 1))
                tele = jnp.zeros((len(fixed_cams), B, 4), jnp.int32)
                # fixed-cam binning drops ride the incremental lane-3 slot
                tele = tele.at[:, :, 3].set(drops[:nf])
                return ims, depths, wims, wdepths, qpos_new, (tele, drops[nf:])
        else:
            @jax.jit
            def render(state: BatchedState):
                def one_env(args):
                    rel_pose, x_pred, grippers, qpos7 = args
                    scene, qpos_new = compose(rel_pose, x_pred, grippers,
                                              qpos7)
                    ims, depths, wims, wdepths = [], [], [], []
                    for cam, w2c in fixed_cams:
                        im, d = render_one(scene, cam, jnp.asarray(w2c))
                        ims.append(im)
                        depths.append(d)
                    eef_rot = tf.quat_to_rot(grippers[6:10])
                    for cam, eef2c in wrist_cams:
                        w2c = wrist_w2c_jax(eef2c, grippers[:3], eef_rot)
                        im, d = render_one(scene, cam, w2c)
                        wims.append(im)
                        wdepths.append(d)
                    stack = lambda xs: (jnp.stack(xs) if xs
                                        else jnp.zeros((0, 1, 1)))
                    return (stack(ims), stack(depths), stack(wims),
                            stack(wdepths), qpos_new)

                outs = jax.lax.map(one_env, (state.rel_pose, state.sm.x,
                                             state.grippers, state.qpos7))
                B = state.sm.x.shape[0]
                return outs + ((jnp.zeros((len(fixed_cams), B, 4), jnp.int32),
                                jnp.zeros((len(wrist_cams), B), jnp.int32)),)

        self._render = render
        # calibrated per-family budgets (inspection + bench --check parity)
        self.calibrated = {
            "rcfg_wrist": rcfg_wrist, "rcfg_mixed": rcfg_mixed,
            "rcfg_static": rcfg_static, "rcfg_dyn": rcfg_dyn,
            "t_budget": t_budget, "p_mix": p_mix,
            "wrist_precull": ({"cap_blocks": cull_cap,
                               "total_blocks": g_blocks,
                               "dyn_cap_blocks": (dyn_cap if use_dcull
                                                  else None)}
                              if use_cull else None),
        }

        # velocity-control mimic, batched (gs_renderer.py:1115-1166)
        chain = self._chain
        n_dof = chain.n_dof
        eef_idx = chain.link_index("link7")

        def full_q(q7):
            if n_dof > 7:
                return jnp.concatenate([q7, jnp.zeros((n_dof - 7,), q7.dtype)])
            return q7

        def mimic_one(action, qpos7, gripper_counts):
            target = tf.make_se3(action[3:12].reshape(3, 3), action[:3])
            q_sol = ik(qpos7, target)[:7]
            delta = q_sol - qpos7
            norm = jnp.linalg.norm(delta)
            delta = jnp.where(norm > 0.10, delta / jnp.maximum(norm, 1e-9) * 0.10,
                              delta)
            v = delta / 0.02 * 0.15
            new_q = qpos7 + v / 30.0
            T = chain.fk_link(full_q(new_q), eef_idx)
            cur_g = gripper_counts / 800.0
            dg = jnp.clip(action[12] - cur_g, -2.0 / 30.0, 2.0 / 30.0)
            out = jnp.concatenate([T[:3, 3], T[:3, :3].reshape(-1),
                                   (cur_g + dg)[None]])
            return out, new_q

        @jax.jit
        @_highest_precision
        def mimic(actions, qpos7s, gripper_counts):
            return jax.vmap(mimic_one)(actions, qpos7s, gripper_counts)

        self._mimic = mimic

        # mimic fused into the step: ONE device dispatch per control step
        # on the velocity-control path (the tunnel's per-call dispatch
        # floor is ~2-3 ms; two calls per step is pure overhead)
        _step_inner = self._step

        @jax.jit
        def step_mimic(state: BatchedState, actions: jax.Array):
            acts, new_q = mimic(actions, state.qpos7,
                                state.grippers[:, 13] * 800.0)
            return _step_inner(state.replace(qpos7=new_q), acts)

        self._step_mimic = step_mimic

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    @property
    def batch_size(self) -> int:
        return len(self.episode_ids)

    def step(self, actions, do_velocity_control: bool | None = None):
        """actions: (B, 13) cartesian [xyz, rot9, gripper(sim space)]."""
        actions = jnp.asarray(actions, jnp.float32)
        dvc = (bool(self.cfg.env.robot.do_velocity_control)
               if do_velocity_control is None else do_velocity_control)
        if dvc:
            self.state = self._step_mimic(self.state, actions)
        else:
            self.state = self._step(self.state, actions)
        return self.state

    def compose_scenes(self):
        """Full-scene gaussians per env: dict of (B, N, ...) arrays (plus
        the updated IK qpos, discarded). For diagnostics/golden checks."""
        scenes, _ = self._compose(self.state.rel_pose, self.state.sm.x,
                                  self.state.grippers, self.state.qpos7)
        return scenes

    def render(self):
        """Returns (images (B, C_fixed, 3, H, W), depths, wrist images,
        wrist depths) and updates the cached IK qpos. Render telemetry
        lands in ``self.render_telemetry`` as a (fixed, wrist) tuple:
        fixed (n_fixed, B, 4) i32 [n_dirty, dropped_tiles, dropped_pairs,
        binning_dropped], wrist (n_wrist, B) i32 binning drop counts."""
        ims, depths, wims, wdepths, qpos_new, tele = self._render(self.state)
        self.state = self.state.replace(qpos7=qpos_new)
        self.render_telemetry = tele
        return ims, depths, wims, wdepths

    def render_drops(self) -> dict:
        """Named host-side drop counters of the LAST render. Any nonzero
        value means a render budget clipped real pairs/tiles that frame
        (raise RasterConfig.max_pairs_factor / dirty_budget / mix_pairs).
        No silent caps — same contract as the physics telemetry()."""
        if self.render_telemetry is None:
            return {}
        fixed, wrist = self.render_telemetry
        fixed = np.asarray(fixed)
        wrist = np.asarray(wrist)
        return {
            "fixed_dropped_tiles": int(fixed[..., 1].sum()),
            "fixed_dropped_pairs": int(fixed[..., 2].sum()),
            "fixed_binning_dropped": int(fixed[..., 3].sum()),
            "wrist_binning_dropped": int(wrist.sum()),
        }

    def observations(self):
        """Batched policy observations (eval_policy.py:165-178 layout)."""
        ims, depths, wims, wdepths = self.render()
        g = self.state.grippers
        return {
            "observation.state": jnp.concatenate(
                [g[:, :3], g[:, 6:10], 1.0 - g[:, 13:14]], axis=1),
            "observation.images.front": ims[:, 0],
            "observation.images.wrist": (wims[:, 0] if wims.shape[1] > 0
                                         else None),
            "images": ims, "depths": depths,
            "wrist_images": wims, "wrist_depths": wdepths,
        }

    def telemetry(self) -> dict:
        """Saturation counters of the LAST control step (host fetch).

        Keys map SpringMassState.telemetry columns; any nonzero value means
        a physics budget clipped real work that step (raise the
        corresponding PhysicsOptions cap). No silent caps — parity with the
        renderer binning's overflow reporting."""
        t = np.asarray(self.state.sm.telemetry)
        return {
            "self_candidates_dropped": t[:, 0],
            "self_particles_dropped": t[:, 1],
            "contact_particles_dropped": t[:, 2],
            "patch_escapes": t[:, 3],
        }

    def particle_states(self) -> np.ndarray:
        """(B, N, 3) world-frame particles (for success metrics)."""
        return np.asarray(self.state.sm.x - jnp.asarray(self.global_translation))

    def get_state_dumps(self):
        """Per-env state dicts in the success calculators' schema."""
        xs = self.particle_states()
        springs = np.asarray(self.params.springs)
        return [{
            "renderer": {"x": xs[i]},
            "physics": {"static_meshes": self._static_mesh_dumps[i],
                        "init_springs": springs},
        } for i in range(self.batch_size)]

    # ------------------------------------------------------------------
    # checkpoint / resume (mid-episode, beyond the reference's episode-level
    # resumability — SURVEY.md S5 lists no mid-episode resume upstream)
    # ------------------------------------------------------------------

    def save_state(self, path, extra: dict | None = None):
        """Snapshot the full batched simulation state to disk (atomically:
        write + rename, so a kill mid-dump never leaves a torn snapshot).
        ``extra`` rides along for caller bookkeeping (e.g. step counter)."""
        import os
        import pickle

        import jax

        host = jax.tree_util.tree_map(lambda a: np.asarray(a), self.state)
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"episode_ids": self.episode_ids, "state": host,
                         "extra": extra or {}}, f)
        os.replace(tmp, path)

    def load_state(self, path) -> dict:
        """Restore a snapshot taken by save_state (same episode ids/config).
        Returns the snapshot's ``extra`` dict."""
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        assert blob["episode_ids"] == self.episode_ids, \
            "snapshot belongs to different episodes"
        import jax

        self.state = jax.tree_util.tree_map(jnp.asarray, blob["state"])
        return blob.get("extra", {})
