"""Cheetah domain (reference: dm_control/suite/cheetah.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.cheetah import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 10
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking")
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Cheetah(), time_limit=time_limit,
                               random=random, **(environment_kwargs or {}))


class Cheetah(base.Task):
    """Run forward fast (reference cheetah.py Cheetah)."""

    settle_steps = 200  # reference steps 200x after init, then zeroes time

    def init(self, m, qpos, qvel, rc, diff):
        # vectorized draw over limited joints, same call as the reference
        limited = np.asarray(m.jnt_limited, bool)
        jr = np.asarray(m.jnt_range)
        lower, upper = jr[limited].T
        vals = rc.uniform(lower, upper)
        qadr = np.asarray(m.jnt_qposadr)[limited]
        if rc.is_numpy:
            qpos = np.asarray(qpos).copy()
            qpos[qadr] = vals
        else:
            qpos = qpos.at[jnp.asarray(qadr)].set(vals)
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos[1:]
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        speed = self.sensordata(m, d, "torso_subtreelinvel")[0]
        return rewards.tolerance(speed, bounds=(_RUN_SPEED, float("inf")),
                                 margin=_RUN_SPEED, value_at_margin=0,
                                 sigmoid="linear")
