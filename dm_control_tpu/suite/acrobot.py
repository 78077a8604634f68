"""Acrobot domain (reference: dm_control/suite/acrobot.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.acrobot import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 10
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking")
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Balance(sparse=False),
                               time_limit=time_limit, random=random,
                               **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Balance(sparse=True),
                               time_limit=time_limit, random=random,
                               **(environment_kwargs or {}))


class Balance(base.Task):
    """Swing the tip up to the target (reference acrobot.py Balance)."""

    def __init__(self, sparse):
        self._sparse = sparse

    def init(self, m, qpos, qvel, rc, diff):
        vals = rc.uniform(-np.pi, np.pi, 2)
        qpos = self.set_joint_qpos(m, qpos, "shoulder", vals[0])
        qpos = self.set_joint_qpos(m, qpos, "elbow", vals[1])
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        horizontal = jnp.stack([self.xmat(m, d, "upper_arm", "xz"),
                                self.xmat(m, d, "lower_arm", "xz")])
        vertical = jnp.stack([self.xmat(m, d, "upper_arm", "zz"),
                              self.xmat(m, d, "lower_arm", "zz")])
        obs["orientations"] = jnp.concatenate([horizontal, vertical])
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        target_radius = m.site_size[m.names.site["target"], 0]
        to_target = (self.site_xpos(m, d, "target")
                     - self.site_xpos(m, d, "tip"))
        dist = jnp.linalg.norm(to_target)
        return rewards.tolerance(dist, bounds=(0, target_radius),
                                 margin=0 if self._sparse else 1)
