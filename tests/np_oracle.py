"""Independent NumPy oracle of the reference's Warp physics semantics.

A deliberate re-expression of the CUDA kernels in
/root/reference/sim/physics/spring_mass_warp.py — atomics become
np.add.at scatter-adds, the hash grid becomes brute force, BVH point
queries become analytic SDFs — written FROM THE REFERENCE SOURCE, not from
real2sim_eval_tpu, so diffing trajectories against the framework checks
that the framework read the reference correctly (VERDICT round-1 item 5).

Citations (file:line into /root/reference/sim/physics/spring_mass_warp.py
unless noted):
  eval_springs                 :62-104
  update_vel_from_force        :107-129
  update_potential_collision   :196-228 (candidates frozen per control step,
                               rebuilt via phystwin.py:366)
  build_resting_collision_pairs:272-291
  loop / object_collision      :132-268
  mesh_collision               :295-421
  integrate_ground_collision   :424-474
  substep trajectory interp    phystwin.py:374-460
  grasp state machine          phystwin.py:382-415
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# analytic colliders (replace wp.mesh_query_point_sign_winding_number)
# ---------------------------------------------------------------------------


class BoxCollider:
    """Axis-aligned box in its own frame; posed per substep via T(t).

    is_dyn: gripper finger (margin 5mm + two-phase re-query + relative
    velocity) vs static mesh (margin 1mm)."""

    def __init__(self, half_extents, is_dyn=False, finger=0):
        self.half = np.asarray(half_extents, np.float64)
        self.is_dyn = is_dyn
        self.finger = finger

    def sdf(self, p_local):
        """Exact signed distance + outward normal of an AAB (vectorized)."""
        q = np.abs(p_local) - self.half
        outside = np.maximum(q, 0.0)
        d_out = np.linalg.norm(outside, axis=-1)
        d_in = np.minimum(np.max(q, axis=-1), 0.0)
        dist = d_out + d_in
        # gradient: outside -> normalized outside vector with sign of p;
        # inside -> axis of max q
        n_out = np.where(d_out[..., None] > 0,
                         outside / np.maximum(d_out[..., None], 1e-12), 0.0)
        ax = np.argmax(q, axis=-1)
        n_in = np.eye(3)[ax]
        n = np.where(d_out[..., None] > 0, n_out, n_in) * np.sign(
            np.where(p_local == 0.0, 1.0, np.sign(p_local)))
        # normalize (outside corners give unit already; inside gives axis)
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return dist, n


def query_colliders(colliders, poses, pts):
    """Nearest collider per point. poses: list of (4,4) world-from-local.
    Returns dist (N,), normal_world (N,3), idx (N,)."""
    dists, normals = [], []
    for box, T in zip(colliders, poses):
        R, t = T[:3, :3], T[:3, 3]
        pl = (pts - t) @ R            # R^T @ (p - t)
        d, nl = box.sdf(pl)
        dists.append(d)
        normals.append(nl @ R.T)
    D = np.stack(dists)
    best = np.argmin(D, axis=0)
    rows = np.arange(pts.shape[0])
    return (D[best, rows], np.stack(normals)[best, rows], best)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def eval_springs(x, v, springs, rest, spring_Y_log, dashpot_damping,
                 y_min, y_max):
    """spring_mass_warp.py:62-104: per-spring force, atomic add/sub."""
    f = np.zeros_like(x)
    Y = np.exp(spring_Y_log)
    act = Y > y_min
    i, j = springs[act, 0], springs[act, 1]
    dis = x[j] - x[i]
    dl = np.linalg.norm(dis, axis=-1)
    d = dis / np.maximum(dl, 1e-6)[:, None]
    sf = (np.clip(Y[act], y_min, y_max) * (dl / rest[act] - 1.0))[:, None] * d
    vrel = np.sum((v[j] - v[i]) * d, axis=-1)
    df = (dashpot_damping * vrel)[:, None] * d
    total = sf + df
    np.add.at(f, i, total)
    np.add.at(f, j, -total)
    return f


def update_vel_from_force(v, f, masses, dt, drag_damping, reverse_factor):
    """:107-129."""
    g = np.array([0.0, 0.0, -9.8]) * reverse_factor
    a = (f + masses[:, None] * g) / masses[:, None]
    return (v + a * dt) * np.exp(-dt * drag_damping)


def resting_pairs(rest_x, collision_dist):
    """:272-291: pairs within 5x collision_dist at rest are excluded."""
    d = np.linalg.norm(rest_x[:, None] - rest_x[None], axis=-1)
    return d < collision_dist * 5.0


def potential_collisions(x, masks, collision_dist, resting):
    """:196-228 (brute force; candidates gathered within 5x dist but kept
    only when CURRENTLY within collision_dist and cross-group)."""
    n = len(x)
    d = np.linalg.norm(x[:, None] - x[None], axis=-1)
    cand = ((masks[:, None] != masks[None]) & (d < collision_dist)
            & ~resting & ~np.eye(n, dtype=bool))
    return [np.where(cand[i])[0] for i in range(n)]


def object_collision(x, v, masses, masks, cand_lists, collision_dist,
                     elas, fric):
    """:132-268: per-particle AVERAGE impulse over hitting candidates."""
    elas = np.clip(elas, 0.0, 1.0)
    fric = np.clip(fric, 0.0, 2.0)
    v_new = v.copy()
    for i, cand in enumerate(cand_lists):
        if len(cand) == 0:
            continue
        dis = x[cand] - x[i]
        dl = np.linalg.norm(dis, axis=-1)
        rel = v[cand] - v[i]
        hit = (dl < collision_dist) & (np.sum(dis * rel, axis=-1) < -1e-4)
        if not hit.any():
            continue
        dis, dl, rel = dis[hit], dl[hit], rel[hit]
        m2 = masses[cand][hit]
        nrm = dis / np.maximum(dl, 1e-6)[:, None]
        vn = np.sum(rel * nrm, axis=-1)
        inv_m = 1.0 / masses[i] + 1.0 / m2
        Jn = -(1.0 + elas) * vn[:, None] * nrm / inv_m[:, None]
        vt = rel - vn[:, None] * nrm
        vtl = np.maximum(np.linalg.norm(vt, axis=-1), 1e-6)
        a = np.maximum(0.0, 1.0 - fric * (1.0 + elas) * np.abs(vn) / vtl)
        Jt = (a - 1.0)[:, None] * vt / inv_m[:, None]
        J = (Jn + Jt).sum(0) / hit.sum()
        v_new[i] = v[i] - J / masses[i]
    return v_new


def mesh_collision(x, v, colliders, poses, dt, elas, fric, eef_elas, eef_fric,
                   dyn_lin_vel, dyn_omega, center, use_pusher, n_fingers):
    """:295-421 incl. the two-phase gripper re-query and per-finger forces."""
    next_x = x + v * dt
    dist, normal, best = query_colliders(colliders, poses, next_x)
    is_dyn = np.array([colliders[b].is_dyn for b in best])
    finger = np.array([colliders[b].finger for b in best])
    in_range = np.abs(dist) < 0.02
    margin = np.where(is_dyn & (not use_pusher), 0.005, 0.001)
    err = dist - margin
    contact = in_range & (err < 0.0)

    x_new = next_x.copy()
    v_new = v.copy()
    forces = np.zeros((max(n_fingers, 1), 3))
    for i in np.where(contact)[0]:
        if is_dyn[i]:
            vdyn = dyn_lin_vel[finger[i]] + np.cross(dyn_omega, x[i] - center)
            v0 = v[i] - vdyn
            el, fr = np.clip(eef_elas, 0, 1), np.clip(eef_fric, 0, 2)
        else:
            vdyn = np.zeros(3)
            v0 = v[i]
            el, fr = np.clip(elas, 0, 1), np.clip(fric, 0, 2)
        n = normal[i]
        vn = np.dot(v0, n) * n
        vt = v0 - vn
        vtl = max(np.linalg.norm(vt), 1e-6)
        vn_new = -el * vn
        a = max(0.0, 1.0 - fr * (1.0 + el) * np.linalg.norm(vn) / vtl)
        nv = vn_new + a * vt
        if is_dyn[i]:
            nv = nv + vdyn
            # two-phase: re-query at the post-response position (:394-410)
            nx2 = x[i] + nv * dt
            d2, n2, b2 = query_colliders(colliders, poses, nx2[None])
            d2, n2 = d2[0], n2[0]
            if abs(d2) < 0.02 and d2 - margin[i] < 0.0:
                nx2 = nx2 - n2 * (d2 - margin[i])
            x_new[i] = nx2
        else:
            x_new[i] = next_x[i] - n * err[i]
        v_new[i] = nv
        if is_dyn[i]:
            forces[finger[i]] += (vn_new - vn) / dt
    return x_new, v_new, forces


def integrate_ground_collision(x, v, dt, elas, fric, ground_height,
                               reverse_factor):
    """:424-474: velocity response + time-of-impact position integration."""
    elas = np.clip(elas, 0, 1)
    fric = np.clip(fric, 0, 2)
    normal = np.array([0.0, 0.0, 1.0]) * reverse_factor
    next_z = (x[:, 2] + v[:, 2] * dt) * reverse_factor
    colliding = (next_z < ground_height) & (v[:, 2] * reverse_factor < -1e-4)

    vn_mag = v @ normal
    v_n = vn_mag[:, None] * normal
    v_t = v - v_n
    vtl = np.maximum(np.linalg.norm(v_t, axis=-1), 1e-6)
    a = np.maximum(0.0, 1.0 - fric * (1.0 + elas) * np.abs(vn_mag) / vtl)
    v_resp = -elas * v_n + a[:, None] * v_t
    v_new = np.where(colliding[:, None], v_resp, v)
    with np.errstate(divide="ignore", invalid="ignore"):
        toi = np.where(colliding, -(x[:, 2] - ground_height) / v[:, 2], 0.0)
    x_new = x + v * toi[:, None] + v_new * (dt - toi[:, None])
    return x_new, v_new


def grasp_machine(current_openness, grasped, openness_cmd, force_norms,
                  force_threshold, release_threshold=100.0):
    """phystwin.py:397-415 verbatim logic. Returns
    (openness_start, openness_end, new_current, new_grasped)."""
    openness = float(openness_cmd)
    before = current_openness
    if np.all(force_norms < release_threshold):
        grasped = False
    if openness < current_openness:
        if np.all(force_norms > force_threshold):
            openness = current_openness
            grasped = True
        elif grasped:
            current_openness = max(openness, current_openness - 0.05)
            openness = current_openness
        else:
            current_openness = openness
    else:
        current_openness = openness
    return (np.clip(before, 0, 1), np.clip(openness, 0, 1),
            current_openness, grasped)


# ---------------------------------------------------------------------------
# full control step
# ---------------------------------------------------------------------------


def control_step(x, v, springs, rest, spring_Y_log, masses, masks, rest_x,
                 opts, colliders=(), pose_fn=None, ctrl=None):
    """One 30 Hz control step: the reference's substep loop
    (spring_mass_warp.py:823-943 driven by phystwin.py:362-517).

    opts: dict with dt, num_substeps, dashpot_damping, drag_damping,
    spring_Y_min/max, collision_dist, collide_* params, reverse_factor,
    ground_height, self_collision, use_pusher, n_fingers.
    pose_fn(substep_idx) -> list of (4,4) collider poses for that substep.
    ctrl: dict with dyn_lin_vel (n_f,3), dyn_omega (3,),
    center_fn(substep)->(3,).
    Returns (x, v, last_forces).
    """
    dt = opts["dt"]
    n_sub = opts["num_substeps"]
    resting = resting_pairs(rest_x, opts["collision_dist"])
    if opts.get("self_collision", True):
        cands = potential_collisions(x, masks, opts["collision_dist"],
                                     resting)
    forces = np.zeros((max(opts.get("n_fingers", 1), 1), 3))
    for s in range(n_sub):
        f = eval_springs(x, v, springs, rest, spring_Y_log,
                         opts["dashpot_damping"], opts["spring_Y_min"],
                         opts["spring_Y_max"])
        v1 = update_vel_from_force(v, f, masses, dt, opts["drag_damping"],
                                   opts["reverse_factor"])
        if opts.get("self_collision", True):
            v1 = object_collision(x, v1, masses, masks, cands,
                                  opts["collision_dist"],
                                  opts["collide_self_elas"],
                                  opts["collide_self_fric"])
        if colliders:
            x, v1, forces = mesh_collision(
                x, v1, colliders, pose_fn(s), dt,
                opts["collide_elas"], opts["collide_fric"],
                opts["collide_eef_elas"], opts["collide_eef_fric"],
                ctrl["dyn_lin_vel"], ctrl["dyn_omega"], ctrl["center_fn"](s),
                opts.get("use_pusher", False), opts.get("n_fingers", 1))
        x, v = integrate_ground_collision(
            x, v1, dt, opts["collide_elas"], opts["collide_fric"],
            opts.get("ground_height", 0.0), opts["reverse_factor"])
    return x, v, forces
