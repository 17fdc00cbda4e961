"""Device-mesh helpers for multi-chip episode parallelism.

The reference scales evaluation with one OS process per GPU and zero
inter-process communication (reference: experiments/eval_policy_parallel.py:
266-293). The TPU-native equivalent is data parallelism over an ``env``
mesh axis: batched episode state is sharded across chips with
``jax.sharding``; the jitted step is written as per-env vmap, so XLA
partitions it with no communication in the step, and cross-env aggregates
(success statistics) become single collectives over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(n_devices: int | None = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "env"):
    """Shard every leaf's leading (env) axis across the mesh; scalars and
    shared (unbatched) leaves are replicated by callers instead."""
    batched = NamedSharding(mesh, P(axis))
    scalar = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(x, batched if jnp.ndim(x) >= 1 else scalar)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def mean_over_envs(values: jax.Array, mesh: Mesh | None = None,
                   axis: str = "env") -> jax.Array:
    """Aggregate a per-env statistic. Under a sharded batch this lowers to
    one psum over ICI (XLA inserts it from the sharding)."""
    return jnp.mean(values)
