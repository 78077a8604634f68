"""Point-mass domain (reference: dm_control/suite/point_mass.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.point_mass import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking", "easy")
def easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model()
    return control.Environment(m, PointMass(randomize_gains=False),
                               time_limit=time_limit, random=random,
                               **(environment_kwargs or {}))


@SUITE.add()
def hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model()
    return control.Environment(m, PointMass(randomize_gains=True),
                               time_limit=time_limit, random=random,
                               **(environment_kwargs or {}))


class PointMass(base.Task):
    """Reach the target; `hard` randomizes the actuator coupling each
    episode (reference point_mass.py PointMass)."""

    def __init__(self, randomize_gains):
        self._randomize_gains = randomize_gains

    def initial_model_diff(self, m):
        if self._randomize_gains:
            return {"wrap_prm": m.wrap_prm}
        return {}

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        if self._randomize_gains:
            if rc.is_numpy:
                dir1 = rc.randn(2)
                dir1 = dir1 / np.linalg.norm(dir1)
                parallel = True
                while parallel:
                    dir2 = rc.randn(2)
                    dir2 = dir2 / np.linalg.norm(dir2)
                    parallel = abs(np.dot(dir1, dir2)) > 0.9
                wrap = np.asarray(m.wrap_prm).copy()
                wrap[[0, 1]] = dir1
                wrap[[2, 3]] = dir2
                diff = dict(diff, wrap_prm=jnp.asarray(wrap))
            else:
                # jit path: draw two directions; nearly-parallel redraws are
                # replaced by a fixed orthogonal rotation of dir1
                dir1 = rc.randn(2)
                dir1 = dir1 / jnp.linalg.norm(dir1)
                dir2 = rc.randn(2)
                dir2 = dir2 / jnp.linalg.norm(dir2)
                parallel = jnp.abs(jnp.dot(dir1, dir2)) > 0.9
                ortho = jnp.stack([-dir1[1], dir1[0]])
                dir2 = jnp.where(parallel, ortho, dir2)
                wrap = jnp.asarray(m.wrap_prm)
                wrap = wrap.at[0:2].set(dir1).at[2:4].set(dir2)
                diff = dict(diff, wrap_prm=wrap)
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        target_size = m.geom_size[m.names.geom["target"], 0]
        dist = jnp.linalg.norm(self.geom_xpos(m, d, "target")
                               - self.geom_xpos(m, d, "pointmass"))
        near_target = rewards.tolerance(dist, bounds=(0, target_size),
                                        margin=target_size)
        control_reward = jnp.mean(rewards.tolerance(
            d.ctrl, margin=1, value_at_margin=0, sigmoid="quadratic"))
        small_control = (control_reward + 4) / 5
        return near_target * small_control
