"""Synthetic scene/checkpoint generators for tests and benchmarks.

Plays the role the reference's rigid-phystwin creator plays for its users
(experiments/utils/create_rigid_phystwin.py): fabricate a complete PhysTwin
checkpoint from simple geometry, so the full pipeline runs without the
paper's released assets.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .config import ConfigNode
from .physics import checkpoints as ckpt_io
from .physics.topology import connect_springs


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


BUILTIN_URDF = str(Path(__file__).parent / "assets" / "simple_arm.urdf")


def reference_xarm_urdf(root="/root/reference/assets/robots/xarm"):
    """The reference's xArm URDF set when available (parity tests), else
    the built-in arm."""
    root = Path(root)
    if (root / "xarm7_with_gripper.urdf").exists():
        return dict(
            ik_urdf_path=str(root / "xarm7_with_gripper.urdf"),
            collision_urdf_path=str(root / "xarm7_with_gripper_collision.urdf"),
            collision_link_names=["left_finger", "right_finger"],
        )
    return dict(ik_urdf_path=BUILTIN_URDF, collision_urdf_path=BUILTIN_URDF,
                collision_link_names=["left_finger", "right_finger"])


def reference_xarm_pusher_urdf(root="/root/reference/assets/robots/xarm"):
    """The reference's pusher-tool URDF set (cfg/env/xarm_pusher.yaml) when
    available, else None (pusher tests should skip)."""
    urdf = Path(root) / "xarm7_with_pusher.urdf"
    if not urdf.exists():
        return None
    return dict(ik_urdf_path=str(urdf), collision_urdf_path=str(urdf),
                collision_link_names=["pusher_base_link"])


def env_cfg(use_pusher=False, urdf=None, **overrides):
    base = dict(
        sim=dict(frame_rate=30, duration=30),
        robot=dict(type="xarm", use_pusher=use_pusher, n_grippers=1, n_qpos=7,
                   init_gripper_openness=800,
                   init_eef_xyz=[0.2568, 0.0, 0.4005],
                   do_velocity_control=True),
        urdf=urdf or dict(
            ik_urdf_path=BUILTIN_URDF,
            collision_urdf_path=BUILTIN_URDF,
            collision_link_names=["left_finger", "right_finger"],
        ),
        cameras=[],
    )
    base.update(overrides)
    return ConfigNode(base)


def full_cfg(ckpt_path, case_name, use_pusher=False, physics_over=None,
             gs=None, cameras=None, urdf=None):
    cfg = ConfigNode(dict(
        seed=0,
        online=False,
        env_name="BaseEnv-v0",
        obs_mode="rgbd",
        exp_root="log/experiments",
        physics=physics_cfg(ckpt_path=str(ckpt_path), case_name=case_name,
                            **(physics_over or {})).to_dict(),
        env=env_cfg(use_pusher=use_pusher, urdf=urdf).to_dict(),
        gs=gs if gs is not None else dict(use_shs=False,
                                          use_grid_randomization=False),
        renderer=dict(gs_center=[0.3, 0.0, 0.0], gs_distance=0.8,
                      gs_azimuth=160, gs_elevation=20),
    ))
    if cameras is not None:
        cfg.env.cameras = cameras
    return cfg


# ---------------------------------------------------------------------------
# synthetic splat scene (object + table/robot scan + attached mesh)
# ---------------------------------------------------------------------------


def _splat_params(pts, colors, scale=0.004, opacity=4.0):
    """Raw (pre-activation) splat params for given points/colors."""
    from .utils.sh import C0

    n = len(pts)
    sh = np.zeros((n, 48), np.float32)
    sh[:, :3] = (np.asarray(colors, np.float32) - 0.5) / C0
    return {
        "means3D": np.asarray(pts, np.float32),
        "sh_colors": sh,
        "log_scales": np.full((n, 3), np.log(scale), np.float32),
        "unnorm_rotations": np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
        "logit_opacities": np.full((n, 1), opacity, np.float32),
    }


def make_synthetic_scene(root, rope_pts=None, ik_urdf=None, seed=0,
                         n_table=400,
                         table_extent=((-0.2, 0.8), (-0.5, 0.5)),
                         n_obj_dense=0):
    """Write object.ply / scene.ply+mask / clip mesh+splat and return a gs
    config dict mirroring cfg/gs/rope.yaml's schema."""
    from .utils.mesh import make_box, save_obj
    from .utils.ply import save_gaussian_ply

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    # object: a rope of red splats at the origin (posed into place via cfg)
    pts = make_rope_points(n=300, length=0.3, seed=seed) if rope_pts is None else rope_pts
    colors = np.tile([[0.8, 0.1, 0.1]], (len(pts), 1))
    if n_obj_dense:
        # scan-scale body splats fleshing out the rope: the reference's
        # scans LBS ~100k+ object gaussians from ~1000 sim particles
        # (gs_renderer.py:729-757). Order matters — the FIRST len(pts)
        # splats stay the sim particles (reset_state takes the first
        # N_SIM_PARTICLES as LBS bones, gs_renderer.py:239-245); the
        # dense tube rides the same LBS like any scan splat would.
        seg = rng.integers(0, len(pts) - 1, n_obj_dense)
        t = rng.uniform(0.0, 1.0, (n_obj_dense, 1))
        core = pts[seg] * (1.0 - t) + pts[seg + 1] * t
        dense = core + rng.normal(scale=0.008, size=core.shape)
        dcol = np.clip([[0.8, 0.1, 0.1]]
                       + rng.normal(scale=0.06, size=(n_obj_dense, 3)),
                       0.0, 1.0)
        pts = np.concatenate([pts, dense])
        colors = np.concatenate([colors, dcol])
    obj = _splat_params(pts, colors)
    save_gaussian_ply(obj, root / "object.ply")

    # scene: a table plane (mask 0) + robot splats on the link origins.
    # splat size tracks density like real scans do (total plane area / count
    # with a floor), so dense benchmark scenes get realistic ~3-4 mm splats
    # instead of giant overlapping ones
    nt = n_table
    (x0, x1), (y0, y1) = table_extent
    table_pts = np.stack([rng.uniform(x0, x1, nt), rng.uniform(y0, y1, nt),
                          np.zeros(nt)], -1)
    mask = np.zeros(nt + 0, np.int32)
    area_per = (x1 - x0) * (y1 - y0) / nt
    table_scale = float(np.clip(np.sqrt(area_per) * 0.2, 0.0035, 0.01))
    scene_parts = [_splat_params(table_pts, np.tile([[0.4, 0.35, 0.3]], (nt, 1)),
                                 scale=table_scale)]
    masks = [mask]
    if ik_urdf is not None:
        from .kinematics.robot import CANONICAL_ARM_QPOS, RobotModel
        from .renderer.scene import XARM_GRIPPER_LINK_IDS

        robot = RobotModel(ik_urdf)
        init_g_ang = (800.0 - 750.0) * 0.001
        q = np.concatenate([CANONICAL_ARM_QPOS,
                            np.full(robot.chain.n_dof - 7, init_g_ang)])
        fk = robot.fk_numpy(q)
        link_ids = [i for i in XARM_GRIPPER_LINK_IDS
                    if i < len(robot.chain.link_names)]
        per_link = 20
        pts_r, ids_r = [], []
        for lid in link_ids:
            center = fk[lid][:3, 3]
            pts_r.append(center + rng.normal(scale=0.01, size=(per_link, 3)))
            ids_r.append(np.full(per_link, lid, np.int32))
        scene_parts.append(_splat_params(
            np.concatenate(pts_r), np.tile([[0.8, 0.8, 0.8]],
                                           (per_link * len(link_ids), 1))))
        masks.append(np.concatenate(ids_r))

    from .utils.gs_processor import GSProcessor

    scene = GSProcessor().merge(scene_parts)
    save_gaussian_ply(scene, root / "scene.ply")
    np.save(root / "scene_mask.npy", np.concatenate(masks))

    # attached mesh: a box "clip" with its own splats
    clip = make_box((0.03, 0.03, 0.05), center=(0.0, 0.0, 0.025))
    save_obj(clip, root / "clip.obj")
    clip_pts = clip.sample_surface(120, rng)
    save_gaussian_ply(_splat_params(clip_pts, np.tile([[0.1, 0.1, 0.9]], (120, 1))),
                      root / "clip_splat.ply")

    return dict(
        use_shs=False,
        use_grid_randomization=False,
        scene=dict(table_splat_path=str(root / "scene.ply"),
                   total_mask_path=str(root / "scene_mask.npy")),
        object=dict(
            path=str(root / "object.ply"),
            pose=[1.0, 0.0, 0.0, 0.15,
                  0.0, 1.0, 0.0, 0.0,
                  0.0, 0.0, 1.0, 0.02,
                  0.0, 0.0, 0.0, 1.0],
            translation_range=[-0.05, 0.05, -0.05, 0.05, 0.0, 0.0],
            azimuth_range=[-10, 10],
            grid_randomization=dict(
                xy=[[-0.05, -0.05], [0.0, 0.0], [0.05, 0.05]],
                theta=[-10, 0, 10], one_to_one=False),
        ),
        meshes=[dict(
            name="clip",
            splat_path=str(root / "clip_splat.ply"),
            mesh_path=str(root / "clip.obj"),
            pose=[1.0, 0.0, 0.0, 0.5,
                  0.0, 1.0, 0.0, 0.05,
                  0.0, 0.0, 1.0, 0.0,
                  0.0, 0.0, 0.0, 1.0],
            translation_range=[0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            azimuth_range=[0, 0],
        )],
    )


TEST_CAMERAS = [
    dict(type="side", h=64, w=128,
         intr=[60.0, 0.0, 64.0, 0.0, 60.0, 32.0, 0.0, 0.0, 1.0],
         c2w=[0.005, 0.613, -0.790, 0.883,
              1.0, -0.004, 0.004, 0.054,
              -0.001, -0.790, -0.613, 0.398,
              0.0, 0.0, 0.0, 1.0]),
    dict(type="wrist", h=64, w=128,
         intr=[60.0, 0.0, 64.0, 0.0, 60.0, 32.0, 0.0, 0.0, 1.0],
         c2w=[-0.006, -1.0, -0.024, 0.07,
              1.0, -0.006, -0.010, -0.006,
              0.010, -0.024, 1.0, 0.031,
              0.0, 0.0, 0.0, 1.0]),
]
