"""Physics/render component profiler for the TPU hot path.

The numbers that drove the round-1 optimization passes (BASELINE.md's
optimization log) came from this ablation protocol. Two rules learned on
the axon tunnel runtime that make naive timing garbage:

1. ``block_until_ready`` is effectively a no-op and single-call timings
   measure the ~2-3 ms per-call dispatch floor, not device work. Only
   summed multi-iteration loops with one final blocking sync are
   trustworthy — and per-SUBSTEP costs must be measured by scanning the
   component N times inside ONE jitted call.
2. Each XLA fusion inside a compiled loop costs ~13 us fixed on this
   pipeline, so per-substep cost is usually op-count-bound, not
   work-bound. Compare component variants by toggling them, not by
   reading HLO.

Usage (runs on whatever backend JAX selects; meaningful on TPU):
    python -m real2sim_eval_tpu.experiments.utils.profile_physics
    python -m real2sim_eval_tpu.experiments.utils.profile_physics --render
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(name, fn, init, n_inner, iters=5):
    import jax

    f = jax.jit(fn)
    t0 = time.perf_counter()
    s = f(init)
    jax.block_until_ready(s)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = init
    for _ in range(iters):
        s = f(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:8.1f} ms/call  "
          f"({dt / n_inner * 1e6:7.1f} us/substep, compile {compile_s:.0f}s)")
    return dt


def profile_physics(batch=8, n=1000, substeps=667):
    import jax
    import jax.numpy as jnp

    from real2sim_eval_tpu.physics.sdf import build_sdf_grid
    from real2sim_eval_tpu.physics.spring_mass import (
        MeshColliderSet, PhysicsOptions, SpringMassParams, SpringMassState,
        SubstepControls, make_step_fn)
    from real2sim_eval_tpu.physics.topology import (build_neighbor_tables,
                                                    build_rolled_tables,
                                                    connect_springs)
    from real2sim_eval_tpu.testing import make_rope_points
    from real2sim_eval_tpu.utils.mesh import make_box

    print("backend:", jax.default_backend())
    rope = make_rope_points(n=n, length=0.4).astype(np.float32)
    springs, rest = connect_springs(rope, radius=0.02, max_neighbours=30)
    ylog = np.log(np.full(len(springs), 2e3, np.float32))
    nbr_idx, nbr_rest, nbr_y = build_neighbor_tables(springs, rest, ylog, n)
    rolled = build_rolled_tables(springs, rest, ylog, n)

    finger = build_sdf_grid(make_box((0.02, 0.04, 0.08), center=(0, 0, 0.04)))
    static = build_sdf_grid(make_box((0.03, 0.03, 0.05), center=(0.5, 0, 0.025)))
    ftab = np.tile(np.eye(4, dtype=np.float32), (2, 101, 1, 1))
    ftab[:, :, 2, 3] = 0.10
    ftab[0, :, 1, 3] = -0.04
    ftab[1, :, 1, 3] = 0.04
    colliders = MeshColliderSet(
        fingers=(finger, finger), finger_pose_table=jnp.asarray(ftab),
        statics=(static,),
        static_pose=jnp.asarray(np.eye(4, dtype=np.float32)[None]))

    params = SpringMassParams(
        springs=jnp.asarray(springs), rest_lengths=jnp.asarray(rest),
        spring_Y_log=jnp.asarray(ylog), masses=jnp.ones((n,), jnp.float32),
        nbr_idx=jnp.asarray(nbr_idx), nbr_rest=jnp.asarray(nbr_rest),
        nbr_Y_log=jnp.asarray(nbr_y),
        roll_rest=(jnp.asarray(rolled[1]) if rolled else None),
        roll_Y_log=(jnp.asarray(rolled[2]) if rolled else None),
        roll_offsets=(tuple(int(o) for o in rolled[0]) if rolled else ()),
        collision_mask=jnp.arange(n, dtype=jnp.int32),
        rest_x=jnp.asarray(rope),
        collide_elas=jnp.asarray(0.5), collide_fric=jnp.asarray(0.3),
        collide_eef_elas=jnp.asarray(0.0), collide_eef_fric=jnp.asarray(1.0),
        collide_self_elas=jnp.asarray(0.5), collide_self_fric=jnp.asarray(0.3))

    rot = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32))
    ctrl1 = SubstepControls(
        eef_xyz=jnp.asarray([0.2, 0.0, 0.3]), eef_vel=jnp.zeros(3),
        eef_rot=rot, eef_rot_vel=jnp.zeros(3),
        openness_start=jnp.asarray(1.0), openness_end=jnp.asarray(0.8),
        dyn_lin_vel=jnp.zeros((2, 3)), dyn_omega=jnp.zeros(3))
    import jax as _jax
    ctrl = _jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), ctrl1)
    state = SpringMassState(
        x=jnp.broadcast_to(jnp.asarray(rope), (batch, n, 3)),
        v=jnp.zeros((batch, n, 3)),
        finger_forces=jnp.zeros((batch, 2, 3)))

    for name, self_c, has_c in (("full", True, True),
                                ("no-selfcollision", False, True),
                                ("no-contact", True, False),
                                ("springs-only", False, False)):
        opts = PhysicsOptions(dt=5e-5, num_substeps=substeps, fps=30,
                              self_collision=self_c, n_fingers=2)
        step = make_step_fn(opts, has_colliders=has_c)
        coll = colliders if has_c else None
        _timeit(name,
                lambda s, step=step, coll=coll: jax.vmap(
                    lambda se, ce: step(params, coll, se, ce))(s, ctrl),
                state, substeps)


def profile_render(n=31000, h=480, w=848):
    import jax.numpy as jnp

    from real2sim_eval_tpu.renderer.binning import bin_gaussians
    from real2sim_eval_tpu.renderer.camera import setup_camera
    from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians
    from real2sim_eval_tpu.renderer.raster import (RasterConfig, TILE_H,
                                                   TILE_W, rasterize)
    from real2sim_eval_tpu.utils.sh import C0

    rng = np.random.default_rng(0)
    k = np.array([[427.3, 0, 430.0], [0, 426.8, 242.8], [0, 0, 1]], np.float32)
    c2w = np.array([[0.005, 0.613, -0.790, 0.883],
                    [1.0, -0.004, 0.004, 0.054],
                    [-0.001, -0.790, -0.613, 0.398],
                    [0, 0, 0, 1]], np.float32)
    w2c = jnp.asarray(np.linalg.inv(c2w))
    cam, _ = setup_camera(w, h, k, np.asarray(w2c))

    means = jnp.asarray(rng.uniform([-0.2, -0.5, 0.0], [0.8, 0.5, 0.3],
                                    (n, 3)).astype(np.float32))
    scales = jnp.full((n, 3), 0.004, jnp.float32)
    quats = jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32))
    opac = jnp.full((n, 1), 0.8, jnp.float32)
    shs = jnp.asarray(((rng.random((n, 1, 3)) - 0.5) / C0).astype(np.float32))

    cfg = RasterConfig(backend="pallas")
    tx, ty = -(-w // TILE_W), -(-h // TILE_H)
    maxp = -(-int(cfg.max_pairs_factor * n) // cfg.chunk) * cfg.chunk

    pre = _timeit("preprocess",
                  lambda m: preprocess_gaussians(cam, w2c, m, scales, quats,
                                                 opac, shs, 0),
                  means, 1, iters=10)
    pre = preprocess_gaussians(cam, w2c, means, scales, quats, opac, shs, 0)
    _timeit("binning",
            lambda p: bin_gaussians(p, tx, ty, TILE_W, TILE_H, maxp,
                                    cfg.max_tiles_per_gaussian,
                                    cfg.small_tiles, cfg.max_large),
            pre, 1, iters=10)
    _timeit("full rasterize",
            lambda m: rasterize(cam, w2c, m, scales, quats, opac, shs, 0,
                                config=cfg)[0],
            means, 1, iters=10)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--particles", type=int, default=1000)
    args = parser.parse_args()
    if args.render:
        profile_render()
    else:
        profile_physics(batch=args.batch, n=args.particles)


if __name__ == "__main__":
    main()
