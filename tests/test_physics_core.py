"""Unit tests for the spring-mass physics core: golden values on
analytically solvable systems (the test strategy SURVEY.md S4 calls for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.physics.spring_mass import (
    MeshColliderSet,
    PhysicsOptions,
    SpringMassParams,
    SpringMassState,
    SubstepControls,
    build_collision_candidates,
    ground_collision_integrate,
    make_step_fn,
    self_collision_impulse,
    spring_forces,
    velocity_update,
)
from real2sim_eval_tpu.physics.topology import build_neighbor_tables, connect_springs


def make_params(x0, springs, rest, Y=3e4, masses=None, **collide):
    n = len(x0)
    Y_log = np.full(len(springs), np.log(Y), np.float32)
    nbr_idx, nbr_rest, nbr_Y = build_neighbor_tables(
        springs, np.asarray(rest, np.float32), Y_log, n)
    defaults = dict(collide_elas=0.5, collide_fric=0.3, collide_eef_elas=0.0,
                    collide_eef_fric=1.0, collide_self_elas=0.5,
                    collide_self_fric=0.3)
    defaults.update(collide)
    return SpringMassParams(
        springs=jnp.asarray(springs, jnp.int32),
        rest_lengths=jnp.asarray(rest, jnp.float32),
        spring_Y_log=jnp.full((len(springs),), np.log(Y), jnp.float32),
        masses=jnp.ones(n, jnp.float32) if masses is None else jnp.asarray(masses),
        nbr_idx=jnp.asarray(nbr_idx),
        nbr_rest=jnp.asarray(nbr_rest),
        nbr_Y_log=jnp.asarray(nbr_Y),
        collision_mask=jnp.arange(n, dtype=jnp.int32),
        rest_x=jnp.asarray(x0, jnp.float32),
        **{k: jnp.asarray(v, jnp.float32) for k, v in defaults.items()},
    )


def no_colliders():
    return MeshColliderSet(
        fingers=(), finger_pose_table=jnp.zeros((1, 101, 4, 4)),
        statics=(), static_pose=jnp.zeros((0, 4, 4)))


def null_controls(n_fingers=1):
    return SubstepControls(
        eef_xyz=jnp.zeros(3), eef_vel=jnp.zeros(3),
        eef_rot=jnp.eye(3), eef_rot_vel=jnp.zeros(3),
        openness_start=jnp.asarray(1.0), openness_end=jnp.asarray(1.0),
        dyn_lin_vel=jnp.zeros((n_fingers, 3)), dyn_omega=jnp.zeros(3))


class TestSpringForces:
    def test_single_spring_magnitude(self):
        rest = 0.1
        stretch = 1.5
        x = jnp.array([[0.0, 0, 0], [rest * stretch, 0, 0]])
        springs = np.array([[0, 1]], np.int32)
        params = make_params(x, springs, [rest], Y=1e4)
        f = spring_forces(params, PhysicsOptions(), x, jnp.zeros_like(x))
        # force on particle 0 pulls toward particle 1: Y*(L/rest - 1)
        expected = 1e4 * (stretch - 1.0)
        np.testing.assert_allclose(f[0], [expected, 0, 0], rtol=1e-5)
        np.testing.assert_allclose(f[1], [-expected, 0, 0], rtol=1e-5)

    def test_incidence_matches_scatter(self, rng):
        pts = rng.random((40, 3)).astype(np.float32)
        springs, rest = connect_springs(pts, 0.4, 8)
        params = make_params(pts, springs, rest)
        x = jnp.asarray(pts + rng.normal(scale=0.01, size=pts.shape), jnp.float32)
        v = jnp.asarray(rng.normal(scale=0.1, size=pts.shape), jnp.float32)
        opts = PhysicsOptions()
        f = spring_forces(params, opts, x, v)

        # oracle: explicit scatter-add like the reference's atomic adds
        i1, i2 = springs[:, 0], springs[:, 1]
        dis = x[i2] - x[i1]
        dl = jnp.linalg.norm(dis, axis=-1)
        d = dis / jnp.maximum(dl, 1e-6)[:, None]
        Y = jnp.exp(params.spring_Y_log).clip(opts.spring_Y_min, opts.spring_Y_max)
        sf = (Y * (dl / params.rest_lengths - 1.0))[:, None] * d
        vr = jnp.sum((v[i2] - v[i1]) * d, -1)
        sf = sf + (opts.dashpot_damping * vr)[:, None] * d
        oracle = jnp.zeros_like(x).at[i1].add(sf).at[i2].add(-sf)
        np.testing.assert_allclose(f, oracle, atol=1e-3)

    def test_inactive_spring_no_force(self):
        x = jnp.array([[0.0, 0, 0], [0.2, 0, 0]])
        params = make_params(x, np.array([[0, 1]], np.int32), [0.1], Y=1e4)
        opts = PhysicsOptions(spring_Y_min=1e5)  # exp(Y) < Y_min -> inactive
        f = spring_forces(params, opts, x, jnp.zeros_like(x))
        np.testing.assert_allclose(f, 0.0)

    def test_dashpot_damping(self):
        x = jnp.array([[0.0, 0, 0], [0.1, 0, 0]])
        v = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])  # separating at 1 m/s
        params = make_params(x, np.array([[0, 1]], np.int32), [0.1], Y=1e-12)
        opts = PhysicsOptions(spring_Y_min=-1.0)
        f = spring_forces(params, opts, x, v)
        # pure dashpot: damping * v_rel along spring axis
        np.testing.assert_allclose(f[0], [100.0 * 1.0, 0, 0], atol=1e-3)


class TestVelocityUpdate:
    def test_gravity_and_drag(self):
        opts = PhysicsOptions()
        params = make_params(np.zeros((1, 3)), np.zeros((0, 2), np.int32), [])
        v = velocity_update(params, opts, jnp.zeros((1, 3)), jnp.zeros((1, 3)))
        expected = -9.8 * opts.dt * np.exp(-opts.dt * opts.drag_damping)
        np.testing.assert_allclose(v[0, 2], expected, rtol=1e-5)

    def test_reverse_z(self):
        opts = PhysicsOptions(reverse_factor=-1.0)
        params = make_params(np.zeros((1, 3)), np.zeros((0, 2), np.int32), [])
        v = velocity_update(params, opts, jnp.zeros((1, 3)), jnp.zeros((1, 3)))
        assert v[0, 2] > 0  # gravity flips


class TestGroundCollision:
    def test_free_fall_integration(self):
        opts = PhysicsOptions()
        params = make_params(np.zeros((1, 3)), np.zeros((0, 2), np.int32), [])
        x = jnp.array([[0.0, 0.0, 1.0]])
        v = jnp.array([[0.0, 0.0, -1.0]])
        x2, v2 = ground_collision_integrate(params, opts, x, v)
        np.testing.assert_allclose(x2, [[0, 0, 1.0 - opts.dt]], rtol=1e-5)
        np.testing.assert_allclose(v2, v)

    def test_bounce_with_elasticity(self):
        opts = PhysicsOptions(dt=0.01)
        params = make_params(np.zeros((1, 3)), np.zeros((0, 2), np.int32), [],
                             collide_elas=0.5, collide_fric=0.0)
        x = jnp.array([[0.0, 0.0, 0.005]])
        v = jnp.array([[0.0, 0.0, -1.0]])
        x2, v2 = ground_collision_integrate(params, opts, x, v)
        np.testing.assert_allclose(v2[0, 2], 0.5, rtol=1e-4)  # -elas * v_n
        assert x2[0, 2] >= 0.0  # time-of-impact: never sinks below ground

    def test_friction_stops_sliding(self):
        opts = PhysicsOptions(dt=0.01)
        params = make_params(np.zeros((1, 3)), np.zeros((0, 2), np.int32), [],
                             collide_elas=0.0, collide_fric=2.0)
        x = jnp.array([[0.0, 0.0, 0.001]])
        v = jnp.array([[0.1, 0.0, -1.0]])  # steep impact, high friction
        _, v2 = ground_collision_integrate(params, opts, x, v)
        np.testing.assert_allclose(v2[0], 0.0, atol=1e-6)


class TestSelfCollision:
    def _two_particle_params(self):
        # start far apart so they are not a resting pair
        x0 = np.array([[0.0, 0, 0], [0.1, 0, 0]], np.float32)
        return make_params(x0, np.zeros((0, 2), np.int32), [],
                           collide_self_elas=1.0, collide_self_fric=0.0)

    def test_candidates_and_impulse(self):
        params = self._two_particle_params()
        opts = PhysicsOptions(collision_dist=0.01, max_candidates=4)
        x = jnp.array([[0.0, 0, 0], [0.005, 0, 0]])  # within collision_dist
        idx, valid, _ = build_collision_candidates(params, opts, x)
        assert bool(valid[0].any()) and bool(valid[1].any())

        v = jnp.array([[1.0, 0, 0], [-1.0, 0, 0]])  # head-on approach
        v2 = self_collision_impulse(params, opts, x, v, idx, valid)
        # perfectly elastic equal masses: velocities exchange
        np.testing.assert_allclose(v2, [[-1, 0, 0], [1, 0, 0]], atol=1e-4)

    def test_resting_pair_excluded(self):
        x0 = np.array([[0.0, 0, 0], [0.004, 0, 0]], np.float32)  # close at rest
        params = make_params(x0, np.zeros((0, 2), np.int32), [])
        opts = PhysicsOptions(collision_dist=0.005)
        idx, valid, _ = build_collision_candidates(params, opts, jnp.asarray(x0))
        assert not bool(valid.any())

    def test_fused_slot_build_matches_topk_chain(self):
        """build_candidate_slots (iterative argmin) must be BITWISE
        identical to build_collision_candidates + compact_candidate_slots
        (chained top_k) — same nearest-kp selection, same tie rule."""
        from real2sim_eval_tpu.physics.spring_mass import (
            build_candidate_slots, compact_candidate_slots)

        rng = np.random.default_rng(3)
        n = 150
        x0 = rng.uniform(0, 0.2, (n, 3)).astype(np.float32)
        params = make_params(x0, np.zeros((0, 2), np.int32), [])
        opts = PhysicsOptions(collision_dist=0.03, max_candidates=32,
                              max_self_particles=48, max_self_slots=4,
                              candidate_chunk=64)
        # crowded state: many pairs inside collision_dist, incl. ties
        x = jnp.asarray(rng.uniform(0, 0.08, (n, 3)).astype(np.float32))
        ci, cv, _ = build_collision_candidates(params, opts, x)
        sel_a, sidx_a, sok_a, ndp_a = compact_candidate_slots(
            opts, x, ci, cv)
        sel_b, sidx_b, sok_b, _, ndp_b = build_candidate_slots(
            params, opts, x)
        np.testing.assert_array_equal(np.asarray(sel_a), np.asarray(sel_b))
        np.testing.assert_array_equal(np.asarray(sok_a), np.asarray(sok_b))
        # indices only meaningful where ok
        np.testing.assert_array_equal(
            np.asarray(jnp.where(sok_a, sidx_a, -1)),
            np.asarray(jnp.where(sok_b, sidx_b, -1)))
        assert int(ndp_a) == int(ndp_b)

    def test_separating_pair_no_impulse(self):
        params = self._two_particle_params()
        opts = PhysicsOptions(collision_dist=0.01, max_candidates=4)
        x = jnp.array([[0.0, 0, 0], [0.005, 0, 0]])
        idx, valid, _ = build_collision_candidates(params, opts, x)
        v = jnp.array([[-1.0, 0, 0], [1.0, 0, 0]])  # separating
        v2 = self_collision_impulse(params, opts, x, v, idx, valid)
        np.testing.assert_allclose(v2, v)


class TestFullStep:
    def test_terminal_velocity(self):
        """A free particle under gravity + exponential drag reaches the
        analytic terminal velocity g*dt*e/(1-e), e = exp(-dt*drag)."""
        opts = PhysicsOptions(num_substeps=2000, dt=1e-3, drag_damping=30.0,
                              self_collision=False)
        params = make_params(np.array([[0.0, 0, 100.0]]),
                             np.zeros((0, 2), np.int32), [])
        step = jax.jit(make_step_fn(opts, has_colliders=False))
        state = SpringMassState(x=jnp.array([[0.0, 0, 100.0]]),
                                v=jnp.zeros((1, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        state = step(params, None, state, null_controls())
        e = np.exp(-opts.dt * opts.drag_damping)
        v_term = -9.8 * opts.dt * e / (1.0 - e)
        np.testing.assert_allclose(state.v[0, 2], v_term, rtol=1e-3)

    def test_two_body_oscillation_frequency(self):
        """Two masses on a stretched spring oscillate at
        omega = sqrt(2*(Y/rest)/m) in the axis transverse to gravity."""
        rest = 0.1
        Y = 100.0
        m = 1.0
        # 20% stretched, high above the ground so free fall never contacts
        x0 = np.array([[0.0, 0, 50.0], [rest * 1.2, 0, 50.0]])
        params = make_params(x0, np.array([[0, 1]], np.int32), [rest], Y=Y,
                             masses=np.full(2, m, np.float32))
        dt = 1e-3
        opts = PhysicsOptions(num_substeps=1, dt=dt, drag_damping=0.0,
                              dashpot_damping=0.0, self_collision=False)
        step = jax.jit(make_step_fn(opts, has_colliders=False))
        state = SpringMassState(x=jnp.asarray(x0, jnp.float32),
                                v=jnp.zeros((2, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        seps = []
        for _ in range(400):
            state = step(params, None, state, null_controls())
            seps.append(float(state.x[1, 0] - state.x[0, 0]) - rest)
        seps = np.asarray(seps)
        # count sign changes -> half-periods
        crossings = np.where(np.diff(np.sign(seps)) != 0)[0]
        assert len(crossings) >= 2
        half_period = np.mean(np.diff(crossings)) * dt
        omega_meas = np.pi / half_period
        omega_true = np.sqrt(2.0 * (Y / rest) / m)
        np.testing.assert_allclose(omega_meas, omega_true, rtol=0.05)

    def test_rope_falls_to_ground(self):
        from fixtures import make_rope_points

        pts = make_rope_points(n=60, length=0.3)
        pts[:, 2] += 0.05  # start above ground
        springs, rest = connect_springs(pts, 0.02, 10)
        params = make_params(pts, springs, rest, Y=1e4)
        opts = PhysicsOptions(num_substeps=667, self_collision=False)
        step = jax.jit(make_step_fn(opts, has_colliders=False))
        state = SpringMassState(x=jnp.asarray(pts, jnp.float32),
                                v=jnp.zeros_like(jnp.asarray(pts, jnp.float32)),
                                finger_forces=jnp.zeros((1, 3)))
        for _ in range(10):
            state = step(params, None, state, null_controls())
        z = np.asarray(state.x[:, 2])
        assert np.all(z > -0.005)          # never sinks below ground
        assert np.abs(z).max() < 0.02      # settled near the ground
        assert np.abs(np.asarray(state.v)).max() < 0.1  # nearly at rest

    def test_energy_decays_under_damping(self):
        from fixtures import make_rope_points

        pts = make_rope_points(n=40, length=0.2)
        pts[:, 2] += 0.5
        springs, rest = connect_springs(pts, 0.02, 10)
        params = make_params(pts, springs, rest)
        opts = PhysicsOptions(num_substeps=300, drag_damping=50.0,
                              self_collision=False)
        step = jax.jit(make_step_fn(opts, has_colliders=False))
        state = SpringMassState(
            x=jnp.asarray(pts, jnp.float32),
            v=jnp.asarray(np.random.default_rng(0).normal(
                scale=1.0, size=pts.shape), jnp.float32),
            finger_forces=jnp.zeros((1, 3)))
        ke = [float(jnp.sum(state.v ** 2))]
        for _ in range(4):
            state = step(params, None, state, null_controls())
            ke.append(float(jnp.sum(state.v ** 2)))
        assert ke[-1] < ke[0] * 0.1
        assert np.isfinite(np.asarray(state.x)).all()

    def test_vmap_over_envs(self):
        """The step must vmap over a batch axis (the framework's core claim)."""
        from fixtures import make_rope_points

        pts = make_rope_points(n=30, length=0.2)
        pts[:, 2] += 0.1
        springs, rest = connect_springs(pts, 0.02, 8)
        params = make_params(pts, springs, rest)
        opts = PhysicsOptions(num_substeps=50, self_collision=True,
                              max_candidates=8)
        step = make_step_fn(opts, has_colliders=False)

        B = 4
        batch_x = jnp.stack([jnp.asarray(pts, jnp.float32) +
                             0.01 * i for i in range(B)])
        states = SpringMassState(
            x=batch_x, v=jnp.zeros_like(batch_x),
            finger_forces=jnp.zeros((B, 1, 3)))
        batched = jax.jit(jax.vmap(step, in_axes=(None, None, 0, None)))
        out = batched(params, None, states, null_controls())
        assert out.x.shape == (B, 30, 3)
        # each lane evolves from its own start and stays finite
        assert np.isfinite(np.asarray(out.x)).all()
        assert not np.allclose(out.x[0], out.x[1])


class TestMatmulGather:
    def test_matches_gather_path(self, rng):
        """The MXU one-hot path must agree with the row-gather path to f32
        exactness (the hi/lo bf16 split reconstructs values exactly)."""
        pts = rng.random((120, 3)).astype(np.float32)
        springs, rest = connect_springs(pts, 0.3, 10)
        params = make_params(pts, springs, rest, Y=2e4)
        E = jax.nn.one_hot(np.asarray(params.nbr_idx).reshape(-1),
                           len(pts), dtype=jnp.bfloat16)
        params_mm = params.replace(nbr_onehot=E)
        x = jnp.asarray(pts + rng.normal(scale=0.01, size=pts.shape), jnp.float32)
        v = jnp.asarray(rng.normal(scale=0.2, size=pts.shape), jnp.float32)
        opts = PhysicsOptions()
        f_gather = spring_forces(params, opts, x, v)
        f_matmul = spring_forces(params_mm, opts, x, v)
        np.testing.assert_allclose(np.asarray(f_matmul), np.asarray(f_gather),
                                   rtol=1e-6, atol=1e-4)

    def test_rolled_path_matches_gather(self, rng):
        """Offset-structured (roll) evaluation must equal the gather path."""
        from real2sim_eval_tpu.physics.topology import build_rolled_tables

        from fixtures import make_rope_points
        pts = make_rope_points(n=100, length=0.3).astype(np.float32)
        springs, rest = connect_springs(pts, 0.02, 10)
        params = make_params(pts, springs, rest, Y=2e3)
        rolled = build_rolled_tables(
            springs, np.asarray(rest, np.float32),
            np.full(len(springs), np.log(2e3), np.float32), len(pts))
        assert rolled is not None
        params_r = params.replace(
            roll_rest=jnp.asarray(rolled[1]), roll_Y_log=jnp.asarray(rolled[2]),
            roll_offsets=tuple(int(o) for o in rolled[0]))
        x = jnp.asarray(pts + rng.normal(scale=0.002, size=pts.shape), jnp.float32)
        v = jnp.asarray(rng.normal(scale=0.1, size=pts.shape), jnp.float32)
        opts = PhysicsOptions()
        f_g = spring_forces(params, opts, x, v)
        f_r = spring_forces(params_r, opts, x, v)
        np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_g),
                                   rtol=1e-5, atol=1e-2)


class TestPairCompaction:
    @pytest.mark.slow
    def test_pairs_match_padded_path(self, rng):
        """The compacted-pair impulse must equal the padded (N, K) impulse
        when the budget holds every candidate."""
        from real2sim_eval_tpu.physics.spring_mass import (
            compact_candidate_pairs, self_collision_pairs_impulse)

        # a cluster of particles in contact, distinct masks
        x0 = (rng.random((40, 3)).astype(np.float32)) * 0.5  # rest: spread out
        params = make_params(x0, np.zeros((0, 2), np.int32), [],
                             collide_self_elas=0.7, collide_self_fric=0.4)
        opts = PhysicsOptions(collision_dist=0.02, max_candidates=8,
                              max_self_pairs=40 * 8)
        x = jnp.asarray(rng.random((40, 3)) * 0.05, jnp.float32)  # squeezed
        v = jnp.asarray(rng.normal(scale=0.5, size=(40, 3)), jnp.float32)
        ci, cv, _ = build_collision_candidates(params, opts, x)
        assert bool(cv.any())
        v_ref = self_collision_impulse(params, opts, x, v, ci, cv)
        pi, pj, ok, lo, hi = compact_candidate_pairs(opts, x, ci, cv)
        v_new = self_collision_pairs_impulse(params, opts, x, v, pi, pj, ok, lo, hi)
        np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref),
                                   atol=1e-5)

    def test_budget_keeps_nearest(self, rng):
        from real2sim_eval_tpu.physics.spring_mass import compact_candidate_pairs

        x0 = rng.random((30, 3)).astype(np.float32)
        params = make_params(x0, np.zeros((0, 2), np.int32), [])
        opts = PhysicsOptions(collision_dist=0.05, max_candidates=8,
                              max_self_pairs=4)
        x = jnp.asarray(rng.random((30, 3)) * 0.03, jnp.float32)
        ci, cv, _ = build_collision_candidates(params, opts, x)
        pi, pj, ok, lo, hi = compact_candidate_pairs(opts, x, ci, cv)
        assert pi.shape == (4,)
        d_kept = np.linalg.norm(np.asarray(x)[np.asarray(pi)]
                                - np.asarray(x)[np.asarray(pj)], axis=-1)
        # kept pairs are among the closest valid ones
        all_d = np.linalg.norm(np.asarray(x)[:, None] - np.asarray(x)[None],
                               axis=-1)
        assert d_kept.max() <= np.sort(all_d[all_d > 0])[:60].max() + 1e-6


class TestSlotCompaction:
    def test_slots_match_padded_path(self, rng):
        """The slot-form impulse must equal the padded (N, K) impulse when
        every particle's candidates fit in the slots and all active
        particles fit in the budget."""
        from real2sim_eval_tpu.physics.spring_mass import (
            compact_candidate_slots, self_collision_slots_impulse)

        x0 = (rng.random((40, 3)).astype(np.float32)) * 0.5
        params = make_params(x0, np.zeros((0, 2), np.int32), [],
                             collide_self_elas=0.7, collide_self_fric=0.4)
        opts = PhysicsOptions(collision_dist=0.02, max_candidates=8,
                              max_self_slots=8, max_self_particles=40)
        x = jnp.asarray(rng.random((40, 3)) * 0.05, jnp.float32)
        v = jnp.asarray(rng.normal(scale=0.5, size=(40, 3)), jnp.float32)
        ci, cv, _ = build_collision_candidates(params, opts, x)
        assert bool(cv.any())
        v_ref = self_collision_impulse(params, opts, x, v, ci, cv)
        sel, sidx, sok, _ = compact_candidate_slots(opts, x, ci, cv)
        inv_m = (1.0 / params.masses[sel][:, None] + 1.0 / params.masses[sidx])
        v_new = self_collision_slots_impulse(params, opts, x, v, sel, sidx,
                                             sok, inv_m, params.masses[sel])
        np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref),
                                   atol=1e-5)

    def test_slot_budget_keeps_nearest_particles(self, rng):
        from real2sim_eval_tpu.physics.spring_mass import (
            compact_candidate_slots)

        x0 = rng.random((30, 3)).astype(np.float32)
        params = make_params(x0, np.zeros((0, 2), np.int32), [])
        opts = PhysicsOptions(collision_dist=0.05, max_candidates=8,
                              max_self_slots=4, max_self_particles=6)
        x = jnp.asarray(rng.random((30, 3)) * 0.03, jnp.float32)
        ci, cv, _ = build_collision_candidates(params, opts, x)
        sel, sidx, sok, _ = compact_candidate_slots(opts, x, ci, cv)
        assert sel.shape == (6,) and sidx.shape == (6, 4)
        # selected particles have the globally nearest active candidates
        xn = np.asarray(x)
        d_sel = np.linalg.norm(xn[np.asarray(sel)] - xn[np.asarray(sidx)[:, 0]],
                               axis=-1)
        assert np.all(np.asarray(sok)[:, 0])
        all_d = np.linalg.norm(xn[:, None] - xn[None], axis=-1)
        assert d_sel.max() <= np.sort(all_d[all_d > 0])[:20].max() + 1e-6
