from .batched import BatchedEvaluator, BatchedState
from .mesh import make_env_mesh, shard_batch

__all__ = ["BatchedEvaluator", "BatchedState", "make_env_mesh", "shard_batch"]
