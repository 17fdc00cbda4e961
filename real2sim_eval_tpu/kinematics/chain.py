"""Batched forward kinematics in pure JAX.

Replaces the SAPIEN/pinocchio FK the reference calls on the CPU every control
step (reference: sim/utils/robot/kinematics_utils.py:41-46,
robot_pc_sampler.py:68-83). Because the chain topology is static, FK unrolls
into a fixed sequence of 4x4 composes that XLA fuses into the jitted step —
no host round-trip, and it vmaps over both qpos batches and environment
batches for free.

DOF convention: every non-fixed joint is an independent DOF in URDF document
order (SAPIEN ignores ``mimic`` tags and the reference feeds all six xArm
finger joints the same angle, robot_pc_sampler.py:242-246).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.urdf import UrdfModel, load_urdf


@dataclass(frozen=True)
class KinematicChain:
    """Flat FK tables. All numpy here; FK itself runs in JAX."""

    link_names: tuple[str, ...]
    parent: np.ndarray        # (L,) int, -1 for root links
    joint_type: np.ndarray    # (L,) int: 0 fixed, 1 revolute/continuous, 2 prismatic
    origins: np.ndarray       # (L, 4, 4) parent->joint frame
    axes: np.ndarray          # (L, 3)
    dof_index: np.ndarray     # (L,) int, -1 if fixed
    n_dof: int
    topo_order: np.ndarray    # (L,) evaluation order (parents first)
    lower: np.ndarray         # (n_dof,)
    upper: np.ndarray         # (n_dof,)

    @staticmethod
    def from_urdf(model: UrdfModel) -> "KinematicChain":
        names = model.link_names
        idx = {n: i for i, n in enumerate(names)}
        L = len(names)
        parent = np.full(L, -1, dtype=np.int32)
        jtype = np.zeros(L, dtype=np.int32)
        origins = np.tile(np.eye(4), (L, 1, 1))
        axes = np.tile(np.array([1.0, 0.0, 0.0]), (L, 1))
        dof_index = np.full(L, -1, dtype=np.int32)
        lower, upper = [], []

        dof = 0
        for j in model.joints:
            c = idx[j.child]
            parent[c] = idx[j.parent]
            origins[c] = j.origin
            axes[c] = j.axis
            if j.type in ("revolute", "continuous"):
                jtype[c] = 1
            elif j.type == "prismatic":
                jtype[c] = 2
            else:
                jtype[c] = 0
            if jtype[c] != 0:
                dof_index[c] = dof
                lower.append(j.lower)
                upper.append(j.upper)
                dof += 1

        # topological order: repeatedly emit links whose parent is emitted
        emitted = np.zeros(L, dtype=bool)
        order = []
        for _ in range(L):
            for i in range(L):
                if not emitted[i] and (parent[i] < 0 or emitted[parent[i]]):
                    emitted[i] = True
                    order.append(i)
        assert len(order) == L, "URDF kinematic graph has a cycle"

        return KinematicChain(
            link_names=tuple(names),
            parent=parent,
            joint_type=jtype,
            origins=origins.astype(np.float64),
            axes=axes.astype(np.float64),
            dof_index=dof_index,
            n_dof=dof,
            topo_order=np.array(order, dtype=np.int32),
            lower=np.array(lower, dtype=np.float64),
            upper=np.array(upper, dtype=np.float64),
        )

    @staticmethod
    def from_urdf_file(path) -> "KinematicChain":
        return KinematicChain.from_urdf(load_urdf(path))

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)

    # ------------------------------------------------------------------
    # FK
    # ------------------------------------------------------------------

    def fk(self, qpos: jax.Array, dtype=jnp.float32) -> jax.Array:
        """World pose of every link.

        Args:
          qpos: (n_dof,) joint positions (leading batch dims allowed).
        Returns:
          (..., L, 4, 4) link poses in base/world frame.
        """
        qpos = jnp.asarray(qpos, dtype)
        batch = qpos.shape[:-1]
        L = len(self.link_names)

        poses: list = [None] * L
        eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))
        for i in self.topo_order:
            i = int(i)
            p = int(self.parent[i])
            local = jnp.asarray(self.origins[i], dtype)
            jt = int(self.joint_type[i])
            if jt != 0:
                q = qpos[..., int(self.dof_index[i])]
                axis = jnp.asarray(self.axes[i], dtype)
                if jt == 1:
                    motion = _rot_about_axis(axis, q, dtype)
                else:
                    motion = _prismatic(axis, q, dtype)
                local = local @ motion
            poses[i] = local if p < 0 else poses[p] @ local
            if p < 0:
                poses[i] = jnp.broadcast_to(local, batch + (4, 4)) if batch else local
        # ensure batch shape consistency
        stacked = jnp.stack(
            [jnp.broadcast_to(poses[i], batch + (4, 4)) for i in range(L)], axis=-3
        )
        del eye
        return stacked

    def fk_link(self, qpos: jax.Array, link: int | str, dtype=jnp.float32) -> jax.Array:
        """World pose of one link — computes only its ancestor path."""
        if isinstance(link, str):
            link = self.link_index(link)
        qpos = jnp.asarray(qpos, dtype)
        # walk up the ancestor chain (static python loop)
        chain = []
        i = link
        while i >= 0:
            chain.append(i)
            i = int(self.parent[i])
        pose = None
        for i in reversed(chain):
            local = jnp.asarray(self.origins[i], dtype)
            jt = int(self.joint_type[i])
            if jt != 0:
                q = qpos[..., int(self.dof_index[i])]
                axis = jnp.asarray(self.axes[i], dtype)
                motion = _rot_about_axis(axis, q, dtype) if jt == 1 else _prismatic(axis, q, dtype)
                local = local @ motion
            pose = local if pose is None else pose @ local
        return pose


def _rot_about_axis(axis: jax.Array, angle: jax.Array, dtype) -> jax.Array:
    """4x4 rotation about a unit axis; batched over ``angle``."""
    x, y, z = axis[0], axis[1], axis[2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    C = 1.0 - c
    batch = jnp.shape(angle)
    rows = jnp.stack(
        [
            jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
            jnp.stack([x * y * C + z * s, c + y * y * C, y * z * C - x * s], -1),
            jnp.stack([x * z * C - y * s, y * z * C + x * s, c + z * z * C], -1),
        ],
        axis=-2,
    )
    T = jnp.zeros(batch + (4, 4), dtype)
    T = T.at[..., :3, :3].set(rows.astype(dtype))
    T = T.at[..., 3, 3].set(1.0)
    return T


def _prismatic(axis: jax.Array, disp: jax.Array, dtype) -> jax.Array:
    batch = jnp.shape(disp)
    T = jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))
    t = axis[None] * disp[..., None] if batch else axis * disp
    return T.at[..., :3, 3].set(t.astype(dtype)) if batch else T.at[:3, 3].set(t.astype(dtype))
