"""URDF parsing into flat kinematic tables.

Replaces both the vendored ``urdfpy`` (reference: third-party/urdfpy, used for
collision-mesh loading in sim/utils/robot/robot_pc_sampler.py:47-65) and the
SAPIEN URDF loader / pinocchio model (sim/utils/robot/kinematics_utils.py:26).

Design notes:
  - Links are kept in **document order** so integer link ids match the
    reference's SAPIEN ``get_links()`` ids, which the per-Gaussian scan masks
    index into (reference: sim/utils/robot/robot_pc_transformations.py:31-43,
    link_id_list [1..8, 10..16]).
  - Actuated (non-fixed, non-mimic-resolved) joints keep document order, so a
    qpos vector laid out like the reference's (7 arm + 6 finger values,
    robot_pc_sampler.py:245-246) maps one-to-one. SAPIEN ignores ``mimic``
    tags and exposes every non-fixed joint as a DOF, and the reference feeds
    all six finger joints the same value — we reproduce that behaviour.
  - Output is a set of numpy tables consumed by kinematics/chain.py to build
    a jittable FK.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .mesh import TriMesh, load_mesh, make_box, make_sphere


def resolve_geometry(spec, root_dir: Path) -> TriMesh:
    """A collision-geometry spec -> TriMesh. Spec is a mesh filename or a
    primitive tuple ('box', size) / ('sphere', r) / ('cylinder', r, l)."""
    if isinstance(spec, str):
        return load_mesh(Path(root_dir) / spec)
    kind = spec[0]
    if kind == "box":
        return make_box(spec[1])
    if kind == "sphere":
        return make_sphere(spec[1])
    if kind == "cylinder":
        r, ln = spec[1], spec[2]
        import numpy as _np

        n = 24
        ang = _np.linspace(0, 2 * _np.pi, n, endpoint=False)
        ring = _np.stack([r * _np.cos(ang), r * _np.sin(ang)], -1)
        bot = _np.concatenate([ring, _np.full((n, 1), -ln / 2)], -1)
        top = _np.concatenate([ring, _np.full((n, 1), ln / 2)], -1)
        verts = _np.concatenate([bot, top,
                                 [[0, 0, -ln / 2]], [[0, 0, ln / 2]]], 0)
        faces = []
        cb, ct = 2 * n, 2 * n + 1
        for i in range(n):
            j = (i + 1) % n
            faces += [[i, j, n + i], [j, n + j, n + i],      # side
                      [cb, j, i], [ct, n + i, n + j]]        # caps
        return TriMesh(verts.astype(_np.float32),
                       _np.asarray(faces, _np.int32))
    raise ValueError(f"unknown geometry spec {spec!r}")


def _parse_floats(text: str | None, default: str) -> np.ndarray:
    return np.array([float(x) for x in (text or default).split()], dtype=np.float64)


def _rpy_to_mat(rpy: np.ndarray) -> np.ndarray:
    r, p, y = rpy
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def _origin_to_se3(elem: ET.Element | None) -> np.ndarray:
    T = np.eye(4)
    if elem is not None:
        xyz = _parse_floats(elem.get("xyz"), "0 0 0")
        rpy = _parse_floats(elem.get("rpy"), "0 0 0")
        T[:3, :3] = _rpy_to_mat(rpy)
        T[:3, 3] = xyz
    return T


@dataclass
class UrdfJoint:
    name: str
    type: str                      # revolute | prismatic | continuous | fixed
    parent: str
    child: str
    origin: np.ndarray             # (4,4)
    axis: np.ndarray               # (3,)
    lower: float = 0.0
    upper: float = 0.0
    mimic_joint: str | None = None
    mimic_multiplier: float = 1.0
    mimic_offset: float = 0.0


@dataclass
class UrdfLink:
    name: str
    collision_meshes: list[tuple[str, float, np.ndarray]] = field(default_factory=list)
    # list of (mesh_path, scale, origin_se3); primitives are converted to meshes
    visual_meshes: list[tuple[str, float, np.ndarray]] = field(default_factory=list)


@dataclass
class UrdfModel:
    name: str
    links: list[UrdfLink]                   # document order (= reference link ids)
    joints: list[UrdfJoint]                 # document order
    root_dir: Path

    def link_index(self, name: str) -> int:
        for i, l in enumerate(self.links):
            if l.name == name:
                return i
        raise KeyError(name)

    @property
    def link_names(self) -> list[str]:
        return [l.name for l in self.links]

    @property
    def actuated_joints(self) -> list[UrdfJoint]:
        return [j for j in self.joints if j.type != "fixed"]

    def load_collision_mesh(self, link_name: str) -> TriMesh | None:
        """First collision mesh of a link, scaled, in link frame (with the
        collision origin applied) — mirroring robot_pc_sampler.py:57-65 which
        takes ``link.collisions[0]`` and stores its origin as the offset."""
        link = self.links[self.link_index(link_name)]
        if not link.collision_meshes:
            return None
        spec, scale, origin = link.collision_meshes[0]
        mesh = resolve_geometry(spec, self.root_dir)
        if scale != 1.0:
            mesh.scale(scale)
        return mesh, origin

    def collision_offset(self, link_name: str) -> np.ndarray:
        link = self.links[self.link_index(link_name)]
        if link.collision_meshes:
            return link.collision_meshes[0][2]
        return np.eye(4)


def load_urdf(path: str | Path) -> UrdfModel:
    path = Path(path)
    root = ET.parse(path).getroot()
    links: list[UrdfLink] = []
    joints: list[UrdfJoint] = []

    for elem in root:
        if elem.tag == "link":
            link = UrdfLink(name=elem.get("name"))
            for kind, store in (("collision", link.collision_meshes),
                                ("visual", link.visual_meshes)):
                for coll in elem.findall(kind):
                    origin = _origin_to_se3(coll.find("origin"))
                    geom = coll.find("geometry")
                    if geom is None:
                        continue
                    mesh_el = geom.find("mesh")
                    if mesh_el is not None:
                        fname = mesh_el.get("filename", "")
                        fname = fname.replace("package://", "")
                        scale_attr = mesh_el.get("scale")
                        scale = float(scale_attr.split()[0]) if scale_attr else 1.0
                        store.append((fname, scale, origin))
                        continue
                    # primitive geometry -> synthesized mesh spec
                    box = geom.find("box")
                    if box is not None:
                        size = _parse_floats(box.get("size"), "0.1 0.1 0.1")
                        store.append((("box", tuple(size)), 1.0, origin))
                        continue
                    sph = geom.find("sphere")
                    if sph is not None:
                        r = float(sph.get("radius", "0.05"))
                        store.append((("sphere", r), 1.0, origin))
                        continue
                    cyl = geom.find("cylinder")
                    if cyl is not None:
                        r = float(cyl.get("radius", "0.05"))
                        ln = float(cyl.get("length", "0.1"))
                        store.append((("cylinder", r, ln), 1.0, origin))
            links.append(link)
        elif elem.tag == "joint":
            j = UrdfJoint(
                name=elem.get("name"),
                type=elem.get("type", "fixed"),
                parent=elem.find("parent").get("link"),
                child=elem.find("child").get("link"),
                origin=_origin_to_se3(elem.find("origin")),
                axis=_parse_floats(
                    elem.find("axis").get("xyz") if elem.find("axis") is not None else None,
                    "1 0 0",
                ),
            )
            limit = elem.find("limit")
            if limit is not None:
                j.lower = float(limit.get("lower", "0"))
                j.upper = float(limit.get("upper", "0"))
            mimic = elem.find("mimic")
            if mimic is not None:
                j.mimic_joint = mimic.get("joint")
                j.mimic_multiplier = float(mimic.get("multiplier", "1"))
                j.mimic_offset = float(mimic.get("offset", "0"))
            joints.append(j)

    return UrdfModel(name=root.get("name", "robot"), links=links, joints=joints,
                     root_dir=path.parent)
