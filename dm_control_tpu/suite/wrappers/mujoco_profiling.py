"""Exposes per-step physics profiling as an observation
(reference: dm_control/suite/wrappers/mujoco_profiling.py:25).

The reference reads MuJoCo's internal step timer (data.timer[0]).  This
engine has no in-device timers (everything is one fused XLA program), so
the profiling observation reports the constraint-solver iteration count —
the quantity that actually varies per step on the TPU hot path.
"""

from __future__ import annotations

import collections

import dm_env
from dm_env import specs
import numpy as np


class Wrapper(dm_env.Environment):
    """Adds a 'profiling' observation: [solver_niter]."""

    def __init__(self, env):
        self._env = env
        obs_spec = env.observation_spec()
        obs_spec = collections.OrderedDict(obs_spec)
        obs_spec["profiling"] = specs.Array(
            shape=(1,), dtype=np.int32, name="profiling")
        self._observation_spec = obs_spec

    def _add_profiling(self, timestep):
        obs = collections.OrderedDict(timestep.observation)
        niter = np.asarray(
            self._env.physics.data.solver_niter).reshape(1).astype(np.int32)
        obs["profiling"] = niter
        return timestep._replace(observation=obs)

    def step(self, action):
        return self._add_profiling(self._env.step(action))

    def reset(self):
        return self._add_profiling(self._env.reset())

    def observation_spec(self):
        return self._observation_spec

    def action_spec(self):
        return self._env.action_spec()

    def __getattr__(self, name):
        return getattr(self._env, name)
