"""Reacher domain (reference: dm_control/suite/reacher.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.reacher import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
_BIG_TARGET = 0.05
_SMALL_TARGET = 0.015
SUITE = containers.TaggedTasks()


def get_model(target_size):
    def mutate(root):
        wb = root.first("worldbody")
        target = next(g for g in wb.children
                      if g.tag == "geom" and g.get("name") == "target")
        target.attrib["size"] = str(target_size)

    return compile_domain_model(MODEL, mutate=mutate, cache_key=target_size)


@SUITE.add("benchmarking", "easy")
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model(_BIG_TARGET)
    return control.Environment(m, Reacher(), time_limit=time_limit,
                               random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model(_SMALL_TARGET)
    return control.Environment(m, Reacher(), time_limit=time_limit,
                               random=random, **(environment_kwargs or {}))


class Reacher(base.Task):
    """Touch the target with the finger (reference reacher.py Reacher)."""

    def initial_model_diff(self, m):
        return {"geom_pos": m.geom_pos}

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        angle = rc.uniform(0, 2 * np.pi)
        radius = rc.uniform(0.05, 0.20)
        tid = m.names.geom["target"]
        gp = diff["geom_pos"]
        if rc.is_numpy:
            gp = np.asarray(gp).copy()
            gp[tid, 0] = radius * np.sin(angle)
            gp[tid, 1] = radius * np.cos(angle)
            gp = jnp.asarray(gp)
        else:
            gp = gp.at[tid, 0].set(radius * jnp.sin(angle))
            gp = gp.at[tid, 1].set(radius * jnp.cos(angle))
        return qpos, qvel, dict(diff, geom_pos=gp)

    def _finger_to_target(self, m, d):
        return (self.geom_xpos(m, d, "target")[:2]
                - self.geom_xpos(m, d, "finger")[:2])

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos
        obs["to_target"] = self._finger_to_target(m, d)
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        radii = (m.geom_size[m.names.geom["target"], 0]
                 + m.geom_size[m.names.geom["finger"], 0])
        dist = jnp.linalg.norm(self._finger_to_target(m, d))
        return rewards.tolerance(dist, (0, radii))
