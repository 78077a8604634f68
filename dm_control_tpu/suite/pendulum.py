"""Pendulum domain (reference: dm_control/suite/pendulum.py).

Swing up and balance an unactuated-at-rest pendulum.
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.pendulum import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
_ANGLE_BOUND = 8
_COSINE_BOUND = np.cos(np.deg2rad(_ANGLE_BOUND))

SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking")
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    """Returns pendulum swingup task."""
    m = get_model()
    task = SwingUp()
    environment_kwargs = environment_kwargs or {}
    return control.Environment(m, task, time_limit=time_limit, random=random,
                               **environment_kwargs)


class SwingUp(base.Task):
    """Swing up and balance the pole (reference pendulum.py SwingUp)."""

    def init(self, m, qpos, qvel, rc, diff):
        qpos = self.set_joint_qpos(m, qpos, "hinge",
                                   rc.uniform(-np.pi, np.pi))
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["orientation"] = jnp.stack([self.xmat(m, d, "pole", "zz"),
                                        self.xmat(m, d, "pole", "xz")])
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        return rewards.tolerance(self.xmat(m, d, "pole", "zz"),
                                 (_COSINE_BOUND, 1))
