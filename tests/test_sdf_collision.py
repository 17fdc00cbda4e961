import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.physics.sdf import build_sdf_grid, sdf_query
from real2sim_eval_tpu.physics.spring_mass import (
    MeshColliderSet,
    PhysicsOptions,
    SpringMassState,
    SubstepControls,
    make_step_fn,
    mesh_collision_sdf,
)
from real2sim_eval_tpu.utils import mesh as meshlib

from test_physics_core import make_params, null_controls


@pytest.fixture(scope="module")
def box_sdf():
    box = meshlib.make_box((0.1, 0.1, 0.1))
    return build_sdf_grid(box, voxel_size=0.004)


@pytest.fixture(scope="module")
def sphere_sdf():
    sph = meshlib.make_sphere(radius=0.05, n_lat=24, n_lon=48)
    return build_sdf_grid(sph, voxel_size=0.003)


class TestSdfGrid:
    def test_sphere_distances(self, sphere_sdf):
        pts = jnp.array([
            [0.0, 0.0, 0.0],      # center: -radius
            [0.03, 0.0, 0.0],     # inside: -0.02
            [0.06, 0.0, 0.0],     # outside: +0.01
            [0.0, 0.0, 0.06],
        ])
        d, n = sdf_query(sphere_sdf, pts)
        np.testing.assert_allclose(d, [-0.05, -0.02, 0.01, 0.01], atol=0.004)
        # normals point radially outward
        np.testing.assert_allclose(n[2], [1, 0, 0], atol=0.05)
        np.testing.assert_allclose(n[3], [0, 0, 1], atol=0.05)

    def test_box_surface_and_normal(self, box_sdf):
        pts = jnp.array([
            [0.0, 0.0, 0.053],    # 3mm above top face
            [0.0, 0.0, 0.045],    # 5mm inside top face
        ])
        d, n = sdf_query(box_sdf, pts)
        np.testing.assert_allclose(d[0], 0.003, atol=0.0025)
        np.testing.assert_allclose(d[1], -0.005, atol=0.0025)
        np.testing.assert_allclose(n[0], [0, 0, 1], atol=0.1)

    def test_far_outside_grid(self, box_sdf):
        d, _ = sdf_query(box_sdf, jnp.array([[1.0, 1.0, 1.0]]))
        assert d[0] > 100.0  # sentinel: no contact possible

    def test_query_batch_shapes(self, box_sdf):
        pts = jnp.zeros((7, 5, 3))
        d, n = sdf_query(box_sdf, pts)
        assert d.shape == (7, 5)
        assert n.shape == (7, 5, 3)


def static_collider(grid, pose=None):
    return MeshColliderSet(
        fingers=(), finger_pose_table=jnp.zeros((1, 101, 4, 4)),
        statics=(grid,),
        static_pose=jnp.asarray((np.eye(4) if pose is None else pose)[None],
                                jnp.float32))


class TestMeshCollision:
    def test_particle_stops_on_static_box(self, box_sdf):
        """A particle dropped over a box settles ~1mm (static margin) above
        its top face instead of passing through."""
        box_pose = np.eye(4, dtype=np.float32)
        box_pose[2, 3] = 0.05  # box center at z=0.05 -> top face at 0.1
        colliders = static_collider(box_sdf, box_pose)
        pts = np.array([[0.0, 0.0, 0.15]], np.float32)
        params = make_params(pts, np.zeros((0, 2), np.int32), [],
                             collide_elas=0.0, collide_fric=0.3)
        opts = PhysicsOptions(num_substeps=667, self_collision=False, n_fingers=0)
        step = jax.jit(make_step_fn(opts, has_colliders=True))
        state = SpringMassState(x=jnp.asarray(pts), v=jnp.zeros((1, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        for _ in range(8):
            state = step(params, colliders, state, null_controls())
        z = float(state.x[0, 2])
        assert 0.098 <= z <= 0.104, f"particle at z={z}, expected on box top"

    def test_particle_misses_box_hits_ground(self, box_sdf):
        box_pose = np.eye(4, dtype=np.float32)
        box_pose[2, 3] = 0.05
        colliders = static_collider(box_sdf, box_pose)
        pts = np.array([[0.3, 0.0, 0.15]], np.float32)  # off to the side
        params = make_params(pts, np.zeros((0, 2), np.int32), [],
                             collide_elas=0.0)
        opts = PhysicsOptions(num_substeps=667, self_collision=False, n_fingers=0)
        step = jax.jit(make_step_fn(opts, has_colliders=True))
        state = SpringMassState(x=jnp.asarray(pts), v=jnp.zeros((1, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        for _ in range(10):
            state = step(params, colliders, state, null_controls())
        assert abs(float(state.x[0, 2])) < 0.01  # reached the ground

    def test_moving_finger_pushes_particle(self, box_sdf):
        """A dynamic (finger) collider sweeping sideways should push a
        resting particle along, via the contact-frame velocity terms."""
        # finger = the 0.1 box, canonical pose at origin of eef frame
        table = np.tile(np.eye(4, dtype=np.float32), (1, 101, 1, 1))
        colliders = MeshColliderSet(
            fingers=(box_sdf,),
            finger_pose_table=jnp.asarray(table),
            statics=(), static_pose=jnp.zeros((0, 4, 4)))
        # just outside the 5mm contact margin of the +x face (face at 0.05);
        # the sweep (0.5 m/s for 15ms = 7.5mm) must catch and push it
        pts = np.array([[0.056, 0.0, 0.5]], np.float32)
        params = make_params(pts, np.zeros((0, 2), np.int32), [],
                             collide_eef_elas=0.0, collide_eef_fric=1.0)
        opts = PhysicsOptions(num_substeps=300, self_collision=False,
                              n_fingers=1)
        step = jax.jit(make_step_fn(opts, has_colliders=True))
        state = SpringMassState(x=jnp.asarray(pts), v=jnp.zeros((1, 3)),
                                finger_forces=jnp.zeros((1, 3)))
        # eef starts at z=0.5 (finger centered there), sweeping +x at 0.5 m/s
        ctrl = SubstepControls(
            eef_xyz=jnp.array([0.0, 0.0, 0.5]),
            eef_vel=jnp.array([0.5, 0.0, 0.0]),
            eef_rot=jnp.eye(3), eef_rot_vel=jnp.zeros(3),
            openness_start=jnp.asarray(1.0), openness_end=jnp.asarray(1.0),
            dyn_lin_vel=jnp.array([[0.25, 0.0, 0.0]]),  # 0.5 * eef_vel
            dyn_omega=jnp.zeros(3))
        state = step(params, colliders, state, ctrl)
        # particle pushed in +x beyond its start by the sweeping face
        assert float(state.x[0, 0]) > 0.058
        # and finger force accumulated in -x-ish direction on last substep
        assert np.isfinite(np.asarray(state.finger_forces)).all()

    def test_finger_force_nonzero_on_contact(self, box_sdf):
        table = np.tile(np.eye(4, dtype=np.float32), (1, 101, 1, 1))
        colliders = MeshColliderSet(
            fingers=(box_sdf,), finger_pose_table=jnp.asarray(table),
            statics=(), static_pose=jnp.zeros((0, 4, 4)))
        # particle inside the margin band, moving toward the finger
        pts = np.array([[0.052, 0.0, 0.0]], np.float32)
        params = make_params(pts, np.zeros((0, 2), np.int32), [])
        opts = PhysicsOptions(num_substeps=1, self_collision=False, n_fingers=1)
        ctrl = null_controls(1)
        x, v, forces = mesh_collision_sdf(
            params, opts, colliders, ctrl, jnp.asarray(1.0),
            jnp.asarray(pts), jnp.array([[-1.0, 0.0, 0.0]]))
        assert np.linalg.norm(np.asarray(forces)) > 0.0
