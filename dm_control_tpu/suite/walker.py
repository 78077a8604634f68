"""Planar walker domain (reference: dm_control/suite/walker.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.walker import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 25
_CONTROL_TIMESTEP = 0.025
_STAND_HEIGHT = 1.2
_WALK_SPEED = 1
_RUN_SPEED = 8
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


def _env(move_speed, time_limit, random, environment_kwargs):
    m = get_model()
    return control.Environment(
        m, PlanarWalker(move_speed=move_speed), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    return _env(0, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    return _env(_WALK_SPEED, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    return _env(_RUN_SPEED, time_limit, random, environment_kwargs)


class PlanarWalker(base.Task):
    """Stand/walk/run (reference walker.py PlanarWalker)."""

    def __init__(self, move_speed):
        self._move_speed = move_speed

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        # xmat[1:, ['xx','xz']] raveled
        orient = jnp.stack([d.xmat[1:, 0, 0], d.xmat[1:, 0, 2]], axis=-1)
        obs["orientations"] = orient.ravel()
        obs["height"] = self.xpos(m, d, "torso", "z")
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        standing = rewards.tolerance(
            self.xpos(m, d, "torso", "z"),
            bounds=(_STAND_HEIGHT, float("inf")), margin=_STAND_HEIGHT / 2)
        upright = (1 + self.xmat(m, d, "torso", "zz")) / 2
        stand_reward = (3 * standing + upright) / 4
        if self._move_speed == 0:
            return stand_reward
        speed = self.sensordata(m, d, "torso_subtreelinvel")[0]
        move_reward = rewards.tolerance(
            speed, bounds=(self._move_speed, float("inf")),
            margin=self._move_speed / 2, value_at_margin=0.5,
            sigmoid="linear")
        return stand_reward * (5 * move_reward + 1) / 6
