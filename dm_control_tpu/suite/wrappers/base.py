"""Shared delegating base for suite wrappers.

Each wrapper overrides only the methods it changes; everything else
forwards to the wrapped environment (reference wrappers each re-spell
the full dm_env surface; here it lives once).
"""

from __future__ import annotations

import dm_env


class DelegatingWrapper(dm_env.Environment):
    """Forwards the full dm_env surface to ``self._env``."""

    def __init__(self, env):
        self._env = env

    def reset(self):
        return self._env.reset()

    def step(self, action):
        return self._env.step(action)

    def action_spec(self):
        return self._env.action_spec()

    def observation_spec(self):
        return self._env.observation_spec()

    def reward_spec(self):
        return self._env.reward_spec()

    def discount_spec(self):
        return self._env.discount_spec()

    def close(self):
        return self._env.close()

    def __getattr__(self, name):
        return getattr(self._env, name)
