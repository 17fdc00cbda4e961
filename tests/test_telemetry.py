"""Saturation telemetry: physics budget caps must report, never drop
silently (parity with the renderer binning's overflow reporting)."""

import jax
import jax.numpy as jnp
import numpy as np

from real2sim_eval_tpu.physics.sdf import build_sdf_grid
from real2sim_eval_tpu.physics.spring_mass import (
    MeshColliderSet, PhysicsOptions, SpringMassState, make_step_fn,
    build_collision_candidates, compact_candidate_slots,
    select_contact_particles)
from real2sim_eval_tpu.utils import mesh as meshlib

from test_physics_core import make_params, null_controls


def dense_cluster(n=60, spread=0.003, seed=0):
    """n particles crammed inside a few mm — the sloth-stuffed-into-a-box
    regime (VERDICT round-1 weak #5). Rest positions are spread out so no
    pair counts as resting."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    x[:, 2] += 0.2
    rest = (np.arange(n)[:, None] * np.array([0.1, 0.0, 0.0])).astype(
        np.float32) + [0.0, 0.0, 0.2]
    return x, rest


class TestSelfCollisionTelemetry:
    def test_candidate_budget_overflow_counted(self):
        x, rest = dense_cluster()
        params = make_params(rest, np.zeros((0, 2), np.int32), [])
        params = params.replace(rest_x=jnp.asarray(rest))
        opts = PhysicsOptions(max_candidates=4)
        _, _, dropped = build_collision_candidates(params, opts,
                                                   jnp.asarray(x))
        # every particle has ~59 candidates, budget 4
        assert int(dropped) > 0

    def test_particle_budget_overflow_counted(self):
        x, rest = dense_cluster()
        params = make_params(rest, np.zeros((0, 2), np.int32), [])
        params = params.replace(rest_x=jnp.asarray(rest))
        opts = PhysicsOptions(max_candidates=8, max_self_particles=16)
        ci, cv, _ = build_collision_candidates(params, opts, jnp.asarray(x))
        _, _, _, dropped = compact_candidate_slots(opts, jnp.asarray(x),
                                                   ci, cv)
        assert int(dropped) >= 60 - 16

    def test_no_overflow_in_sparse_scene(self):
        rest = np.stack([np.linspace(0, 0.5, 30), np.zeros(30),
                         np.full(30, 0.1)], -1).astype(np.float32)
        params = make_params(rest, np.zeros((0, 2), np.int32), [])
        params = params.replace(rest_x=jnp.asarray(rest))
        opts = PhysicsOptions()
        ci, cv, d1 = build_collision_candidates(params, opts,
                                                jnp.asarray(rest))
        _, _, _, d2 = compact_candidate_slots(opts, jnp.asarray(rest), ci, cv)
        assert int(d1) == 0 and int(d2) == 0


class TestContactTelemetry:
    def test_contact_budget_overflow_counted(self):
        box = build_sdf_grid(meshlib.make_box((0.2, 0.2, 0.05)),
                             voxel_size=0.005)
        n = 64
        x = np.stack([np.linspace(-0.05, 0.05, n), np.zeros(n),
                      np.full(n, 0.03)], -1).astype(np.float32)
        opts = PhysicsOptions(max_contact_particles=16, num_substeps=8)
        combo = {
            "dims": np.asarray([box.values.shape]),
            "inv_spacing": jnp.asarray([box.inv_spacing]),
            "origin": jnp.asarray([box.origin]),
        }
        T_all = jnp.broadcast_to(jnp.eye(4)[None, None],
                                 (opts.num_substeps, 1, 4, 4))
        cand, ok, dropped = select_contact_particles(
            opts, combo, jnp.asarray(x), jnp.zeros((n, 3)), T_all)
        assert int(dropped) == n - 16


class TestStepTelemetryPlumbing:
    def test_step_reports_counters(self):
        x, rest = dense_cluster(n=40)
        params = make_params(rest, np.zeros((0, 2), np.int32), [])
        params = params.replace(rest_x=jnp.asarray(rest))
        opts = PhysicsOptions(num_substeps=4, max_candidates=4,
                              max_self_particles=8, self_collision=True)
        step = jax.jit(make_step_fn(opts, has_colliders=False))
        state = SpringMassState(x=jnp.asarray(x), v=jnp.zeros((40, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        out = step(params, None, state, null_controls())
        tele = np.asarray(out.telemetry)
        assert tele.shape == (4,)
        assert tele[0] > 0      # candidate drops
        assert tele[1] > 0      # particle-budget drops
