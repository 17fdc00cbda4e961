"""Robot model: URDF + link meshes + articulation tables.

Replaces the reference's ``RobotPcSampler`` (sim/utils/robot/robot_pc_sampler.py)
— which leans on SAPIEN FK + open3d sampling per call — with a model that
precomputes everything the jitted hot path needs at load time:

  - per-openness SE(3) pose tables for the gripper fingers (the rigid-pose
    analogue of the reference's 101-sample eef point table,
    robot_pc_transformations.py:184-190): fingers are rigid bodies, so one
    4x4 per openness sample carries the same information as the full point
    set, exactly.
  - link collision meshes (for SDF construction and eef point clouds)
  - point-cloud sampling of link meshes (scene-construction tooling)

Gripper openness convention (reference: robot_pc_sampler.py:242-246):
openness o in [0, 1] (1 = open); the xArm drive reads 800*(1-o) encoder
counts; each finger joint angle is 0.001 rad per count = 0.8*(1-o) rad.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

from ..utils.mesh import TriMesh, load_mesh
from ..utils.urdf import UrdfModel, load_urdf
from .chain import KinematicChain

# canonical arm pose used for building gripper-local tables
# (reference: gs_renderer.py:71, robot_pc_sampler.py:245)
CANONICAL_ARM_QPOS = np.array([0, -45, 0, 30, 0, 75, 0]) * np.pi / 180.0


def openness_to_finger_angle(openness) -> np.ndarray:
    """openness in [0,1] -> finger joint angle in radians."""
    return 0.8 * (1.0 - np.asarray(openness))


class RobotModel:
    """A URDF-backed robot with cached meshes and articulation helpers."""

    def __init__(self, urdf_path: str | Path, link_names: list[str] | None = None):
        self.urdf_path = Path(urdf_path)
        self.urdf: UrdfModel = load_urdf(self.urdf_path)
        self.chain = KinematicChain.from_urdf(self.urdf)
        self._fk_np = None

        # load collision meshes for the requested links (or all that have one)
        self.meshes: dict[str, TriMesh] = {}
        self.offsets: dict[str, np.ndarray] = {}
        prev_offset = np.eye(4)
        for link in self.urdf.links:
            if link_names is not None and link.name not in link_names:
                continue
            if link.collision_meshes:
                spec, scale, origin = link.collision_meshes[0]
                prev_offset = origin
                from ..utils.urdf import resolve_geometry

                mesh = resolve_geometry(spec, self.urdf.root_dir)
                if scale != 1.0:
                    mesh.scale(scale)
                self.meshes[link.name] = mesh
            # quirk parity (robot_pc_sampler.py:53-65): a link without a
            # collision inherits the previously seen collision origin
            self.offsets[link.name] = prev_offset.copy()

        self._pcd_cache: dict[tuple, np.ndarray] = {}

    # ------------------------------------------------------------------
    # FK (host-side numpy; the jitted paths use chain directly)
    # ------------------------------------------------------------------

    def fk_numpy(self, qpos: np.ndarray) -> np.ndarray:
        """All link poses (L, 4, 4) as float64 numpy (host precompute only)."""
        L = len(self.chain.link_names)
        poses = np.zeros((L, 4, 4))
        q = np.asarray(qpos, np.float64)
        for i in self.chain.topo_order:
            i = int(i)
            p = int(self.chain.parent[i])
            local = self.chain.origins[i].copy()
            jt = int(self.chain.joint_type[i])
            if jt != 0:
                qi = q[int(self.chain.dof_index[i])]
                axis = self.chain.axes[i]
                if jt == 1:
                    local = local @ _rot4(axis, qi)
                else:
                    t = np.eye(4)
                    t[:3, 3] = axis * qi
                    local = local @ t
            poses[i] = local if p < 0 else poses[p] @ local
        return poses

    def full_qpos(self, arm_qpos: np.ndarray, openness: float | None = None) -> np.ndarray:
        """Assemble a full DOF vector: 7 arm joints + (optionally) all
        finger joints at the angle implied by ``openness``."""
        n_extra = self.chain.n_dof - len(arm_qpos)
        if n_extra == 0:
            return np.asarray(arm_qpos, np.float64)
        angle = float(openness_to_finger_angle(1.0 if openness is None else openness))
        return np.concatenate([np.asarray(arm_qpos, np.float64),
                               np.full(n_extra, angle)])

    def link_pose(self, qpos: np.ndarray, link_name: str) -> np.ndarray:
        return self.fk_numpy(qpos)[self.chain.link_index(link_name)]

    def compute_mesh_poses(self, qpos: np.ndarray,
                           link_names: list[str] | None = None) -> np.ndarray:
        """World pose of each link's collision mesh (FK @ collision origin),
        parity with robot_pc_sampler.py:68-99."""
        link_names = list(link_names or self.meshes.keys())
        fk = self.fk_numpy(qpos)
        return np.stack([
            fk[self.chain.link_index(n)] @ self.offsets[n] for n in link_names
        ])

    # ------------------------------------------------------------------
    # gripper tables
    # ------------------------------------------------------------------

    def eef_link_name(self) -> str:
        for cand in ("link_eef", "link7"):
            if cand in self.chain.link_names:
                return cand
        raise KeyError("no eef link found")

    def finger_pose_table(
        self,
        finger_links: list[str],
        n_samples: int = 101,
        arm_qpos: np.ndarray | None = None,
    ) -> np.ndarray:
        """(n_fingers, n_samples, 4, 4) mesh-frame -> eef-frame pose per
        openness sample i/(n_samples-1).

        Because fingers attach rigidly below the eef, these poses depend
        only on openness, not the arm configuration — the SE(3) equivalent
        of the reference's per-openness eef point table.
        """
        arm_qpos = CANONICAL_ARM_QPOS if arm_qpos is None else arm_qpos
        eef = self.eef_link_name()
        out = np.zeros((len(finger_links), n_samples, 4, 4))
        for s in range(n_samples):
            o = s / (n_samples - 1)
            q = self.full_qpos(arm_qpos, openness=o)
            fk = self.fk_numpy(q)
            T_we = fk[self.chain.link_index(eef)]
            T_ew = np.linalg.inv(T_we)
            for f, name in enumerate(finger_links):
                T_wl = fk[self.chain.link_index(name)]
                out[f, s] = T_ew @ T_wl @ self.offsets[name]
        return out

    def finger_meshes(self) -> list[TriMesh]:
        """Collision meshes of the loaded links, in mesh-file frame."""
        return [self.meshes[n] for n in self.meshes]

    def finger_link_names(self) -> list[str]:
        return list(self.meshes.keys())

    def get_gripper_meshes(self, gripper_openness: float = 1.0,
                           arm_qpos: np.ndarray | None = None) -> list[TriMesh]:
        """World-frame collision meshes at the canonical arm pose
        (parity: get_xarm_gripper_meshes, robot_pc_sampler.py:242-257)."""
        arm_qpos = CANONICAL_ARM_QPOS if arm_qpos is None else arm_qpos
        q = self.full_qpos(arm_qpos, openness=gripper_openness)
        names = self.finger_link_names()
        poses = self.compute_mesh_poses(q, names)
        out = []
        for i, n in enumerate(names):
            m = self.meshes[n].copy()
            m.transform(poses[i])
            out.append(m)
        return out

    def get_pusher_meshes(self, arm_qpos: np.ndarray | None = None) -> list[TriMesh]:
        return self.get_gripper_meshes(1.0, arm_qpos)

    def eef_points_table(self, n_samples: int = 101,
                         pts_per_mesh: int | None = None) -> np.ndarray:
        """(n_samples, P, 3) eef-frame vertex table across openness — the
        direct analogue of the reference's interp1d table
        (robot_pc_transformations.py:184-190), used by visualization and
        the env API. Uses mesh vertices like the reference."""
        table = self.finger_pose_table(self.finger_link_names(), n_samples)
        verts = [self.meshes[n].vertices for n in self.finger_link_names()]
        out = []
        for s in range(n_samples):
            pts = [v @ table[f, s][:3, :3].T + table[f, s][:3, 3]
                   for f, v in enumerate(verts)]
            out.append(np.concatenate(pts, axis=0))
        return np.stack(out).astype(np.float32)

    # ------------------------------------------------------------------
    # point-cloud sampling (scene construction tooling)
    # ------------------------------------------------------------------

    def sample_pc(self, link_names=None, num_pts=None,
                  rng: np.random.Generator | None = None) -> dict[str, np.ndarray]:
        link_names = list(link_names or self.meshes.keys())
        if num_pts is None:
            num_pts = [200] * len(link_names)
        rng = rng or np.random.default_rng(0)
        return {
            n: self.meshes[n].sample_surface_poisson(k, rng)
            for n, k in zip(link_names, num_pts)
        }

    def compute_robot_pcd(self, qpos, link_names=None, num_pts=None,
                          pcd_name: str | None = None) -> np.ndarray:
        """World-frame sampled robot point cloud at qpos
        (parity: robot_pc_sampler.py:164-214, with the same cache-by-name)."""
        link_names = list(link_names or self.meshes.keys())
        if num_pts is None:
            num_pts = [1000] * len(link_names)
        elif isinstance(num_pts, int):
            num_pts = [num_pts] * len(link_names)
        poses = self.compute_mesh_poses(qpos, link_names)
        pcs = []
        for i, n in enumerate(link_names):
            key = (pcd_name, n, num_pts[i])
            if pcd_name is None or key not in self._pcd_cache:
                cloud = self.meshes[n].sample_surface_poisson(
                    num_pts[i], np.random.default_rng(i))
                if pcd_name is not None:
                    self._pcd_cache[key] = cloud
            else:
                cloud = self._pcd_cache[key]
            pcs.append(cloud @ poses[i][:3, :3].T + poses[i][:3, 3])
        return np.concatenate(pcs, axis=0)


def _rot4(axis: np.ndarray, angle: float) -> np.ndarray:
    x, y, z = axis / max(np.linalg.norm(axis), 1e-12)
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    T = np.eye(4)
    T[:3, :3] = [
        [c + x * x * C, x * y * C - z * s, x * z * C + y * s],
        [x * y * C + z * s, c + y * y * C, y * z * C - x * s],
        [x * z * C - y * s, y * z * C + x * s, c + z * z * C],
    ]
    return T
