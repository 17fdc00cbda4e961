"""Environment registry with gymnasium integration.

Plays the role of the reference's ManiSkill2-derived registry
(sim/utils/env/registration.py:12-145): a local spec table plus gymnasium
registration so both ``envs.make`` and ``gym.make`` resolve the same ids,
with TimeLimit wrapping from ``max_episode_steps``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Type

import gymnasium as gym
from gymnasium.envs.registration import EnvSpec as GymEnvSpec

from ..utils.logging import get_logger

logger = get_logger(__name__)

REGISTERED_ENVS: dict[str, "EnvSpec"] = {}


class EnvSpec:
    def __init__(self, uid: str, cls: Type, max_episode_steps: int | None = None,
                 default_kwargs: dict | None = None):
        self.uid = uid
        self.cls = cls
        self.max_episode_steps = max_episode_steps
        self.default_kwargs = default_kwargs or {}

    def make(self, **kwargs):
        merged = dict(self.default_kwargs)
        merged.update(kwargs)
        return self.cls(**merged)


def register(uid: str, cls: Type, max_episode_steps=None, default_kwargs=None,
             override: bool = False) -> EnvSpec:
    if uid in REGISTERED_ENVS and not override:
        logger.warning("env %s already registered; skipping", uid)
        return REGISTERED_ENVS[uid]
    spec = EnvSpec(uid, cls, max_episode_steps, default_kwargs)
    REGISTERED_ENVS[uid] = spec
    return spec


def make(env_id: str, max_episode_steps: int | None = None, **kwargs):
    """Instantiate a registered env, TimeLimit-wrapped like the reference
    (registration.py:59-97)."""
    if env_id not in REGISTERED_ENVS:
        raise KeyError(f"env {env_id!r} not registered")
    spec = REGISTERED_ENVS[env_id]
    env = spec.make(**kwargs)
    limit = max_episode_steps if max_episode_steps is not None else spec.max_episode_steps
    if limit is not None:
        env = gym.wrappers.TimeLimit(env, max_episode_steps=int(limit))
    return env


def register_env(uid: str, max_episode_steps: int | None = None,
                 override: bool = False, **default_kwargs) -> Callable:
    """Class decorator: register locally AND with gymnasium so
    ``gym.make(uid, ...)`` works (registration.py:100-145)."""

    def decorator(cls):
        register(uid, cls, max_episode_steps, default_kwargs, override=override)

        def entry_point(max_episode_steps=max_episode_steps, **kwargs):
            merged = dict(default_kwargs)
            merged.update(kwargs)
            return cls(**merged)

        if uid in gym.registry:
            if override:
                del gym.registry[uid]
            else:
                return cls
        gym.register(
            id=uid,
            entry_point=lambda **kw: cls(**{**default_kwargs, **kw}),
            max_episode_steps=max_episode_steps,
            disable_env_checker=True,
        )
        return cls

    return decorator
