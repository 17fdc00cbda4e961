from .registration import register_env, make, REGISTERED_ENVS
from .base_env import BaseEnv

__all__ = ["register_env", "make", "REGISTERED_ENVS", "BaseEnv"]
