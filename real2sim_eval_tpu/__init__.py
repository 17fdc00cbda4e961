"""real2sim_eval_tpu: a TPU-native real-to-sim robot policy evaluation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``kywind/real2sim-eval`` (arXiv 2511.04665): a spring-mass soft-body physics
engine coupled to a 3D Gaussian-Splatting renderer, wrapped in a Gymnasium
environment, with policy-evaluation / replay / teleoperation entry points.

Architecture (TPU-first, not a port):
  - Pure-functional simulation core: ``step(assets, state, action) -> state``
    jitted once, ``lax.scan`` over physics substeps (the reference's CUDA-graph
    capture becomes one XLA-compiled function).
  - Batched from day one: ``jax.vmap`` over environments replaces the
    reference's process-per-GPU episode fan-out
    (reference: experiments/eval_policy_parallel.py:266-287).
  - Mesh collision via precomputed signed-distance fields instead of BVH
    point queries (reference: sim/physics/spring_mass_warp.py:295-421).
  - Splatting via a Pallas tile-compositing kernel with median depth
    (reference: third-party/diff-gaussian-rasterization-w-depth).
  - Robot FK/IK in pure JAX (reference uses the SAPIEN C++ pinocchio model,
    sim/utils/robot/kinematics_utils.py).
"""

__version__ = "0.1.0"
