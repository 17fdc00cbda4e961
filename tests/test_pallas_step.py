"""Cross-backend equivalence: fused Pallas control step vs the XLA scan path.

Runs the Pallas kernel in interpreter mode on CPU and diffs trajectories
against make_step_fn vmapped over envs — same params, same controls. This is
the correctness contract the TPU benchmark numbers stand on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.physics import pallas_step
from real2sim_eval_tpu.physics.sdf import build_sdf_grid
from real2sim_eval_tpu.physics.spring_mass import (
    MeshColliderSet, PhysicsOptions, SpringMassParams, SpringMassState,
    SubstepControls, make_step_fn)
from real2sim_eval_tpu.physics.topology import (build_neighbor_tables,
                                                build_rolled_tables,
                                                connect_springs)
from real2sim_eval_tpu.utils import mesh as meshlib


def rope_params(n=40, length=0.4, Y=2e3, fold=False, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, length, n)
    rest = np.stack([t, np.zeros(n), np.full(n, 0.05)], -1)
    rest += rng.normal(scale=1e-3, size=rest.shape)
    rest = rest.astype(np.float32)
    springs, rl = connect_springs(rest, radius=0.035, max_neighbours=6)
    y_log = np.full(len(springs), np.log(Y), np.float32)
    nbr = build_neighbor_tables(springs, rl, y_log, n)
    rolled = build_rolled_tables(springs, rl, y_log, n)
    assert rolled is not None
    if fold:
        # hairpin: second half folds back within collision range of the
        # first half (rest positions stay straight -> not resting pairs)
        x = rest.copy()
        half = n // 2
        x[half:] = x[2 * half - 1 - np.arange(half, n) + half]
        x[half:, 1] += 0.004
    else:
        x = rest.copy()
    p = SpringMassParams(
        springs=jnp.asarray(springs), rest_lengths=jnp.asarray(rl),
        spring_Y_log=jnp.asarray(y_log),
        masses=jnp.ones((n,), jnp.float32),
        nbr_idx=jnp.asarray(nbr[0]), nbr_rest=jnp.asarray(nbr[1]),
        nbr_Y_log=jnp.asarray(nbr[2]),
        collision_mask=jnp.arange(n, dtype=jnp.int32),
        rest_x=jnp.asarray(rest),
        collide_elas=jnp.asarray(0.5), collide_fric=jnp.asarray(0.3),
        collide_eef_elas=jnp.asarray(0.0), collide_eef_fric=jnp.asarray(1.0),
        collide_self_elas=jnp.asarray(0.5),
        collide_self_fric=jnp.asarray(0.3),
        roll_rest=jnp.asarray(rolled[1]), roll_Y_log=jnp.asarray(rolled[2]),
        roll_offsets=tuple(int(o) for o in rolled[0]),
    )
    return p, x


def batched_controls(B, n_f=1, eef_xyz=(0.1, 0.0, 0.2), eef_vel=(0, 0, 0),
                     openness=(1.0, 1.0)):
    one = SubstepControls(
        eef_xyz=jnp.asarray(eef_xyz, jnp.float32),
        eef_vel=jnp.asarray(eef_vel, jnp.float32),
        eef_rot=jnp.eye(3), eef_rot_vel=jnp.zeros(3),
        openness_start=jnp.asarray(openness[0]),
        openness_end=jnp.asarray(openness[1]),
        dyn_lin_vel=jnp.asarray(np.tile(np.asarray(eef_vel, np.float32) * 0.5,
                                        (n_f, 1))),
        dyn_omega=jnp.zeros(3))
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), one)


def run_both(params, colliders, opts, x0_b, ctrl_b, steps=2, atol=3e-5,
             vtol=None):
    B = x0_b.shape[0]
    n = x0_b.shape[1]
    state_p = SpringMassState(
        x=jnp.asarray(x0_b), v=jnp.zeros((B, n, 3), jnp.float32),
        finger_forces=jnp.zeros((B, max(opts.n_fingers, 1), 3), jnp.float32))
    state_x = state_p

    has_coll = colliders is not None and bool(
        len(colliders.fingers) + len(colliders.statics))
    step_ref = make_step_fn(opts, has_colliders=has_coll)
    rest_b = jnp.broadcast_to(params.rest_x[None], (B, n, 3))
    if has_coll:
        sp_b = jnp.broadcast_to(colliders.static_pose[None],
                                (B,) + colliders.static_pose.shape)
    else:
        sp_b = jnp.zeros((B, 0, 4, 4))

    def one_env(rest_e, sp_e, sm_e, ctrl_e):
        p = params.replace(rest_x=rest_e)
        c = (colliders.replace(static_pose=sp_e) if has_coll else colliders)
        return step_ref(p, c, sm_e, ctrl_e)

    ref_step = jax.jit(lambda sm, ctrl: jax.vmap(one_env)(
        rest_b, sp_b, sm, ctrl))

    pal = pallas_step.make_pallas_step_fn(
        opts, params, colliders, batch=B, interpret=True)
    pal_step = jax.jit(lambda sm, ctrl: pal(
        params, sp_b if has_coll else None, rest_b, sm, ctrl))

    for _ in range(steps):
        state_x = ref_step(state_x, ctrl_b)
        state_p = pal_step(state_p, ctrl_b)
    np.testing.assert_allclose(np.asarray(state_p.x), np.asarray(state_x.x),
                               atol=atol, err_msg="positions diverge")
    np.testing.assert_allclose(np.asarray(state_p.v), np.asarray(state_x.v),
                               atol=(atol * 50 if vtol is None else vtol),
                               err_msg="velocities diverge")
    return state_p, state_x


def small_opts(**kw):
    base = dict(num_substeps=58, self_collision=False, n_fingers=0,
                max_candidates=8, max_self_particles=128,
                max_contact_particles=128, max_self_slots=4)
    base.update(kw)
    return PhysicsOptions(**base)


class TestPallasBackend:
    def test_springs_gravity_ground(self):
        params, x0 = rope_params()
        B = 3
        x0_b = np.tile(x0[None], (B, 1, 1))
        x0_b[1, :, 2] += 0.02   # env variation
        x0_b[2, :, 0] += 0.01
        opts = small_opts()
        ctrl = batched_controls(B, n_f=1)
        run_both(params, None, opts, x0_b, ctrl, steps=3)

    def test_prime_substeps_remainder_chunk(self):
        """num_substeps with no good divisor exercises the fixed-K +
        remainder-kernel path."""
        params, x0 = rope_params()
        B = 1
        opts = small_opts(num_substeps=59)   # prime: 1x32 + 27
        ctrl = batched_controls(B, n_f=1)
        run_both(params, None, opts, x0[None], ctrl, steps=2)

    def test_self_collision(self):
        params, x0 = rope_params(fold=True)
        B = 2
        x0_b = np.tile(x0[None], (B, 1, 1))
        x0_b[1, :, 2] += 0.005
        opts = small_opts(self_collision=True)
        ctrl = batched_controls(B, n_f=1)
        state_p, state_x = run_both(params, None, opts, x0_b, ctrl, steps=3)
        # sanity: the hairpin actually produced self-contact activity
        assert np.isfinite(np.asarray(state_p.x)).all()

    @pytest.mark.slow
    def test_static_collider(self):
        params, x0 = rope_params()
        box = build_sdf_grid(meshlib.make_box((0.1, 0.1, 0.1)),
                             voxel_size=0.004)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.2, 0.0, -0.045]   # box top face just under the rope
        colliders = MeshColliderSet(
            fingers=(), finger_pose_table=jnp.zeros((1, 101, 4, 4)),
            statics=(box,), static_pose=jnp.asarray(pose[None]))
        B = 2
        x0_b = np.tile(x0[None], (B, 1, 1))
        opts = small_opts(n_fingers=0)
        ctrl = batched_controls(B, n_f=1)
        state_p, state_x = run_both(params, colliders, opts, x0_b, ctrl,
                                    steps=3)
        # the rope should have met the box (some contact happened)
        assert float(jnp.min(state_x.x[..., 2])) > -0.02

    @pytest.mark.slow
    def test_finger_collider_and_forces(self):
        """Realistic contact onset: the finger sweeps INTO the rope, so
        penetration builds gradually and patches track it exactly."""
        params, x0 = rope_params()
        finger = build_sdf_grid(meshlib.make_box((0.04, 0.04, 0.08)),
                                voxel_size=0.003)
        table = np.tile(np.eye(4, dtype=np.float32), (1, 101, 1, 1))
        colliders = MeshColliderSet(
            fingers=(finger,), finger_pose_table=jnp.asarray(table),
            statics=(), static_pose=jnp.zeros((0, 4, 4)))
        B = 2
        x0_b = np.tile(x0[None], (B, 1, 1))
        # rope sits along x at z=0.05; finger starts clear below and sweeps
        # up into it
        x0_b[..., 2] += 0.04   # rope at z ~ 0.09
        opts = small_opts(n_fingers=1, self_collision=True)
        # top face starts just inside the 5 mm margin band and keeps closing
        # at 0.3 m/s: gentle contact from the first substeps, no deep
        # embedding (ctrl is reused each control step, so the eef pose
        # resets between steps — identical inputs for both backends)
        ctrl = batched_controls(B, n_f=1, eef_xyz=(0.2, 0.0, 0.0455),
                                eef_vel=(0.0, 0.0, 0.3))
        state_p, state_x = run_both(params, colliders, opts, x0_b, ctrl,
                                    steps=3, atol=5e-5)
        # contact actually happened: nonzero finger force on the last substep
        assert float(jnp.abs(state_x.finger_forces).max()) > 0.0
        np.testing.assert_allclose(
            np.asarray(state_p.finger_forces), np.asarray(state_x.finger_forces),
            rtol=2e-3, atol=1.0, err_msg="finger forces diverge")

    @pytest.mark.slow
    def test_embedded_cold_start_bounded(self):
        """Particles initialized deep INSIDE a collider (out-of-distribution
        cold start): the projection jump can leave the chunk's SDF patch, so
        the fused path may miss re-contacts until the next chunk rebuild.
        The deviation must stay bounded (< 1 voxel) and transient."""
        params, x0 = rope_params()
        finger = build_sdf_grid(meshlib.make_box((0.04, 0.04, 0.08)),
                                voxel_size=0.003)
        table = np.tile(np.eye(4, dtype=np.float32), (1, 101, 1, 1))
        colliders = MeshColliderSet(
            fingers=(finger,), finger_pose_table=jnp.asarray(table),
            statics=(), static_pose=jnp.zeros((0, 4, 4)))
        B = 1
        x0_b = x0[None]
        opts = small_opts(n_fingers=1)
        ctrl = batched_controls(B, n_f=1, eef_xyz=(0.14, 0.0, 0.05))
        # positions must stay within ~2 voxels (8 mm); instantaneous
        # velocities may legitimately differ while a projected-out particle
        # waits for the next chunk's patch rebuild (micro-contact flicker),
        # so only a very loose velocity bound applies here
        run_both(params, colliders, opts, x0_b, ctrl, steps=3, atol=8e-3,
                 vtol=2.0)

    @pytest.mark.slow
    def test_pusher_margin(self):
        params, x0 = rope_params()
        tool = build_sdf_grid(meshlib.make_box((0.06, 0.06, 0.06)),
                              voxel_size=0.004)
        table = np.tile(np.eye(4, dtype=np.float32), (1, 101, 1, 1))
        colliders = MeshColliderSet(
            fingers=(tool,), finger_pose_table=jnp.asarray(table),
            statics=(), static_pose=jnp.zeros((0, 4, 4)))
        B = 1
        x0_b = x0[None]
        opts = small_opts(n_fingers=1, use_pusher=True)
        # tool bottom face starts 1.5 mm above the rope (outside the pusher's
        # 1 mm margin) and descends at 0.2 m/s: clean contact onset
        ctrl = batched_controls(B, n_f=1, eef_xyz=(0.2, 0.0, 0.0815),
                                eef_vel=(0.0, 0.0, -0.2))
        run_both(params, colliders, opts, x0_b, ctrl, steps=2, atol=5e-5)


class TestRcmReordering:
    def test_volumetric_blob_via_rcm(self):
        """A shuffled volumetric blob (sloth-class topology) has no rolled
        form in checkpoint order; RCM reordering must recover one and the
        fused step must match the XLA path through the boundary permute."""
        from real2sim_eval_tpu.physics.topology import (
            bandwidth, build_rolled_tables_maybe_reordered)

        rng = np.random.default_rng(3)
        g = np.linspace(0, 0.08, 7)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
        pts = pts[rng.permutation(len(pts))].astype(np.float32)  # shuffled
        pts[:, 2] += 0.1
        springs, rl = connect_springs(pts, radius=0.015, max_neighbours=8)
        ylog = np.full(len(springs), np.log(2e3), np.float32)
        n = len(pts)

        assert build_rolled_tables(springs, rl, ylog, n) is None
        rolled, perm = build_rolled_tables_maybe_reordered(
            springs, rl, ylog, n)
        assert rolled is not None and perm is not None
        assert bandwidth(springs, perm) < 64

        inv = np.empty_like(perm)
        inv[perm] = np.arange(n, dtype=np.int32)
        nbr = build_neighbor_tables(springs, rl, ylog, n)
        params = SpringMassParams(
            springs=jnp.asarray(springs), rest_lengths=jnp.asarray(rl),
            spring_Y_log=jnp.asarray(ylog),
            masses=jnp.ones((n,), jnp.float32),
            nbr_idx=jnp.asarray(nbr[0]), nbr_rest=jnp.asarray(nbr[1]),
            nbr_Y_log=jnp.asarray(nbr[2]),
            collision_mask=jnp.arange(n, dtype=jnp.int32),
            rest_x=jnp.asarray(pts),
            collide_elas=jnp.asarray(0.5), collide_fric=jnp.asarray(0.3),
            collide_eef_elas=jnp.asarray(0.0),
            collide_eef_fric=jnp.asarray(1.0),
            collide_self_elas=jnp.asarray(0.5),
            collide_self_fric=jnp.asarray(0.3),
            roll_rest=jnp.asarray(rolled[1]),
            roll_Y_log=jnp.asarray(rolled[2]),
            roll_offsets=tuple(int(o) for o in rolled[0]),
            roll_perm=jnp.asarray(perm),
            roll_inv_perm=jnp.asarray(inv),
        )
        opts = small_opts(num_substeps=29)
        ctrl = batched_controls(2, n_f=1)
        x0_b = np.tile(pts[None], (2, 1, 1))
        run_both(params, None, opts, x0_b, ctrl, steps=2)


class TestHelpers:
    def test_best_chunk(self):
        assert pallas_step.best_chunk(667) == (29, 23, 0)
        k, nf, rem = pallas_step.best_chunk(2000)
        assert k <= 32 and k * nf + rem == 2000
        assert pallas_step.best_chunk(7) == (7, 1, 0)
        k, nf, rem = pallas_step.best_chunk(59)
        assert k * nf + rem == 59 and rem > 0

    def test_inverse_map(self):
        idx = jnp.asarray([[3, 1, 7], [0, 5, 2]], jnp.int32)
        inv = pallas_step._inverse_map(idx, 8, 99)
        assert inv[0, 3] == 0 and inv[0, 1] == 1 and inv[0, 7] == 2
        assert inv[0, 0] == 99
        assert inv[1, 0] == 0 and inv[1, 5] == 1

    def test_pack_blocks4_roundtrip(self):
        from real2sim_eval_tpu.physics.sdf import pack_blocks4
        v = np.arange(5 * 6 * 7, dtype=np.float32).reshape(5, 6, 7)
        b4 = pack_blocks4(v)
        assert b4.shape == (2 * 3 * 4, 64)
        blk = b4[(1 * 3 + 2) * 4 + 3].reshape(4, 4, 4)
        np.testing.assert_array_equal(blk, v[1:5, 2:6, 3:7])
