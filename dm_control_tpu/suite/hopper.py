"""Hopper domain (reference: dm_control/suite/hopper.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.hopper import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_STAND_HEIGHT = 0.6
_HOP_SPEED = 2
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


def _env(hopping, time_limit, random, environment_kwargs):
    m = get_model()
    return control.Environment(
        m, Hopper(hopping=hopping), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    return _env(False, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def hop(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    return _env(True, time_limit, random, environment_kwargs)


class Hopper(base.Task):
    """Stand or hop forward (reference hopper.py Hopper)."""
    observation_stages = "acc"  # reads touch/force/imu sensors


    def __init__(self, hopping):
        self._hopping = hopping

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def _height(self, m, d):
        return (self.xipos(m, d, "torso", "z")
                - self.xipos(m, d, "foot", "z"))

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos[1:]
        obs["velocity"] = d.qvel
        touch = jnp.concatenate([self.sensordata(m, d, "touch_toe"),
                                 self.sensordata(m, d, "touch_heel")])
        obs["touch"] = jnp.log1p(touch)
        return obs

    def reward(self, m, d):
        standing = rewards.tolerance(self._height(m, d), (_STAND_HEIGHT, 2))
        if self._hopping:
            speed = self.sensordata(m, d, "torso_subtreelinvel")[0]
            hopping = rewards.tolerance(
                speed, bounds=(_HOP_SPEED, float("inf")),
                margin=_HOP_SPEED / 2, value_at_margin=0.5,
                sigmoid="linear")
            return standing * hopping
        small_control = jnp.mean(rewards.tolerance(
            d.ctrl, margin=1, value_at_margin=0, sigmoid="quadratic"))
        small_control = (small_control + 4) / 5
        return standing * small_control
