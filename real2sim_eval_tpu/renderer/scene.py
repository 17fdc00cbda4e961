"""Scene assembly: color correction, randomization, robot-splat articulation.

Pure helpers behind GSRenderer.load_scaniverse
(reference: sim/renderer/gs_renderer.py:333-715) and the xArm splat
articulation (sim/utils/robot/robot_pc_transformations.py:12-132). The
reference repeats its color-correction block three times inline
(gs_renderer.py:420-459, 541-580, 660-699); here it is one function.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.chain import KinematicChain
from ..kinematics.robot import RobotModel
from ..utils import transforms as tf
from ..utils.sh import C0


# ---------------------------------------------------------------------------
# color correction (gs_renderer.py:420-459 linear, :439-459 quadratic)
# ---------------------------------------------------------------------------


def correct_sh_colors(shs: np.ndarray, A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Apply a fitted linear (A: 3x3) or quadratic (A: 3x6 = [A2|A1])
    RGB transform to SH coefficients, order by order.

    The order-0 (DC) band absorbs the affine bias so that the *decoded*
    color C0*sh+0.5 maps through color' = A@color + b; higher bands only
    see the linear part.
    """
    shs = np.asarray(shs, np.float32)          # (n, K, 3)
    A = np.asarray(A, np.float32).reshape(3, -1)
    b = np.asarray(b, np.float32).reshape(3)
    max_deg = int(np.sqrt(shs.shape[1])) - 1
    out = []
    ones = np.ones(3, np.float32)
    if A.shape[1] == 3:
        for si in range(max_deg + 1):
            band = shs[:, si ** 2:(si + 1) ** 2, :]
            if si == 0:
                dc = band[:, 0]
                bias = (1.0 / C0) * ((0.5 * ones) @ A.T + b - 0.5 * ones)
                out.append((dc @ A.T + bias)[:, None])
            else:
                out.append(band @ A.T)
    elif A.shape[1] == 6:
        A2, A1 = A[:, :3], A[:, 3:]
        for si in range(max_deg + 1):
            band = shs[:, si ** 2:(si + 1) ** 2, :]
            if si == 0:
                dc = band[:, 0]
                corr = dc @ A1.T + (dc + C0 * dc ** 2) @ A2.T
                bias = (1.0 / C0) * ((0.25 * ones) @ A2.T
                                     + (0.5 * ones) @ A1.T + b - 0.5 * ones)
                out.append((corr + bias)[:, None])
            else:
                out.append(band @ A1.T)
    else:
        raise ValueError(f"color_A must be 3x3 or 3x6, got {A.shape}")
    return np.concatenate(out, axis=1)


# ---------------------------------------------------------------------------
# pose randomization (gs_renderer.py:342-405 grid, :392-405/:621-634 uniform)
# ---------------------------------------------------------------------------


def grid_random_values(true_index: int, xy_list, theta_list, one_to_one: bool):
    """Deterministic grid cell -> (x, y, z, azimuth_rad). Index arithmetic
    identical to gs_renderer.py:372-383/:601-612."""
    if one_to_one:
        rx, ry = xy_list[true_index]
        ra = theta_list[true_index] * np.pi / 180.0
    else:
        xy_index = true_index // len(theta_list)
        theta_index = true_index % len(theta_list)
        rx, ry = xy_list[xy_index]
        ra = theta_list[theta_index] * np.pi / 180.0
    return float(rx), float(ry), 0.0, float(ra)


def uniform_random_values(rng: np.random.RandomState, translation_range,
                          azimuth_range):
    """Uniform ranges, consumed in the reference's draw order
    (gs_renderer.py:392-405). Uses numpy's legacy global-seed semantics via
    the provided RandomState so seed-for-seed behavior is reproducible."""
    tr = np.asarray(translation_range, np.float64)
    az = np.asarray(azimuth_range, np.float64)
    rx = rng.uniform(tr[0], tr[1])
    ry = rng.uniform(tr[2], tr[3])
    rz = rng.uniform(tr[4], tr[5])
    ra = rng.uniform(az[0], az[1]) * np.pi / 180.0
    return float(rx), float(ry), float(rz), float(ra)


def apply_random_pose(pose: np.ndarray, rand) -> np.ndarray:
    """pose[:3,3] += t; pose[:3,:3] = Rz(a) @ pose[:3,:3]
    (gs_renderer.py:385-388)."""
    rx, ry, rz, ra = rand
    pose = np.array(pose, np.float64)
    pose[:3, 3] += [rx, ry, rz]
    c, s = np.cos(ra), np.sin(ra)
    rot_z = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    pose[:3, :3] = rot_z @ pose[:3, :3]
    return pose


def transform_params_by_pose(params: dict, pose: np.ndarray) -> dict:
    """Rigidly move activated splat params (means + orientations)
    (gs_renderer.py:639-646)."""
    import numpy as np

    R = np.asarray(pose[:3, :3], np.float32)
    t = np.asarray(pose[:3, 3], np.float32)
    out = dict(params)
    out["means3D"] = params["means3D"] @ R.T + t
    q = params["rotations"]
    w = np.sqrt(np.maximum(1 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2
    rq = np.array([w, (R[2, 1] - R[1, 2]) / (4 * w),
                   (R[0, 2] - R[2, 0]) / (4 * w),
                   (R[1, 0] - R[0, 1]) / (4 * w)], np.float32)
    w1, x1, y1, z1 = rq
    w2, x2, y2, z2 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    out["rotations"] = np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2], axis=-1)
    return out


# ---------------------------------------------------------------------------
# robot splat articulation
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RobotArticulation:
    """Precomputed tables to re-pose scene-scan Gaussians with the robot.

    The scan's per-Gaussian integer mask stores URDF document-order link
    ids (reference total_mask, robot_pc_transformations.py:31-43). At load
    we invert each masked link's base-pose mesh transform once; per frame
    the delta transform FK(q) @ offset @ inv(FK(q0) @ offset) is gathered
    per Gaussian by mask id — one (N,) gather + (N,3,3) matmul instead of
    the reference's per-link python loop + boolean indexing
    (robot_pc_transformations.py:43-55).
    """

    chain: KinematicChain
    link_ids: tuple            # document-order link ids with splats
    base_inv: jax.Array        # (L_all, 4, 4) inverse base mesh pose (id slots)
    offsets: jax.Array         # (L_all, 4, 4) collision origin per link
    active: jax.Array          # (L_all,) bool: link participates
    use_pusher: bool

    @staticmethod
    def build(robot: RobotModel, link_ids, base_qpos_full: np.ndarray,
              use_pusher: bool = False) -> "RobotArticulation":
        chain = robot.chain
        L = len(chain.link_names)
        base_fk = robot.fk_numpy(base_qpos_full)
        base_inv = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        offsets = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
        active = np.zeros(L, bool)
        for lid in link_ids:
            name = chain.link_names[lid]
            off = robot.offsets.get(name, np.eye(4))
            offsets[lid] = off.astype(np.float32)
            base_inv[lid] = np.linalg.inv(base_fk[lid] @ off).astype(np.float32)
            active[lid] = True
        return RobotArticulation(
            chain=chain, link_ids=tuple(int(i) for i in link_ids),
            base_inv=jnp.asarray(base_inv), offsets=jnp.asarray(offsets),
            active=jnp.asarray(active), use_pusher=use_pusher)

    def full_qpos(self, arm_qpos: jax.Array, gripper_openness_counts) -> jax.Array:
        """Assemble the chain's DOF vector. Finger joints get
        (800 - counts) * 0.001 rad (robot_pc_transformations.py:40-41)."""
        n_extra = self.chain.n_dof - 7
        if n_extra == 0:
            return arm_qpos
        ang = (800.0 - gripper_openness_counts) * 0.001
        return jnp.concatenate([
            arm_qpos, jnp.full((n_extra,), 1.0, arm_qpos.dtype) * ang])

    def link_deltas(self, qpos_full: jax.Array) -> jax.Array:
        """(L, 4, 4) world-space delta transform per link (identity for
        inactive links)."""
        fk = self.chain.fk(qpos_full)                       # (L, 4, 4)
        delta = (fk @ self.offsets) @ self.base_inv
        eye = jnp.broadcast_to(jnp.eye(4, dtype=delta.dtype), delta.shape)
        return jnp.where(self.active[:, None, None], delta, eye)

    def apply(self, qpos_full: jax.Array, means: jax.Array, quats: jax.Array,
              mask: jax.Array):
        """Re-pose gaussians: (means, quats) under per-link deltas gathered
        by mask id. mask: (N,) int32 (non-link gaussians -> identity)."""
        delta = self.link_deltas(qpos_full)
        idx = jnp.clip(mask, 0, delta.shape[0] - 1)
        D = delta[idx]                                       # (N, 4, 4)
        # broadcast-multiply-reduce fuses with the surrounding elementwise
        # work; einsum would emit a standalone dot_general kernel
        means_new = (jnp.sum(D[:, :3, :3] * means[:, None, :], axis=-1)
                     + D[:, :3, 3])
        dq = tf.rot_to_quat(D[:, :3, :3])
        quats_new = tf.quat_multiply(dq, quats)
        return means_new, quats_new


# link-id lists for the xArm URDF variants
# (robot_pc_transformations.py:33, :112)
XARM_GRIPPER_LINK_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 14, 15, 16)
XARM_PUSHER_LINK_IDS = (1, 2, 3, 4, 5, 6, 7, 8, 10)
