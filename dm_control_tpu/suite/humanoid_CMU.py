"""Humanoid_CMU domain: 56-DoF CMU skeleton
(reference: dm_control/suite/humanoid_CMU.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.humanoid_CMU import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_STAND_HEIGHT = 1.4
_WALK_SPEED = 1
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


def _env(move_speed, time_limit, random, environment_kwargs):
    m = get_model()
    return control.Environment(
        m, HumanoidCMU(move_speed=move_speed), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add()
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    return _env(0, time_limit, random, environment_kwargs)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    return _env(_WALK_SPEED, time_limit, random, environment_kwargs)


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    return _env(_RUN_SPEED, time_limit, random, environment_kwargs)


class HumanoidCMU(base.Task):
    """Stand/walk/run with the CMU skeleton."""

    max_reset_rejections = 100

    def __init__(self, move_speed):
        self._move_speed = move_speed

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def reject(self, m, d):
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["joint_angles"] = d.qpos[7:]
        obs["head_height"] = self.xpos(m, d, "head", "z")
        torso_frame = d.xmat[m.names.body["thorax"]]
        torso_pos = d.xpos[m.names.body["thorax"]]
        positions = []
        for side in ("l", "r"):
            for limb in ("hand", "foot"):
                torso_to_limb = d.xpos[m.names.body[side + limb]] - torso_pos
                positions.append(torso_to_limb @ torso_frame)
        obs["extremities"] = jnp.concatenate(positions)
        obs["torso_vertical"] = d.xmat[m.names.body["thorax"], 2, :]
        obs["com_velocity"] = self.sensordata(m, d,
                                              "thorax_subtreelinvel")
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        standing = rewards.tolerance(
            self.xpos(m, d, "head", "z"),
            bounds=(_STAND_HEIGHT, float("inf")), margin=_STAND_HEIGHT / 4)
        upright = rewards.tolerance(
            self.xmat(m, d, "thorax", "zy"),
            bounds=(0.9, float("inf")), sigmoid="linear",
            margin=1.9, value_at_margin=0)
        stand_reward = standing * upright
        small_control = jnp.mean(rewards.tolerance(
            d.ctrl, margin=1, value_at_margin=0, sigmoid="quadratic"))
        small_control = (4 + small_control) / 5
        com_v = self.sensordata(m, d, "thorax_subtreelinvel")[:2]
        if self._move_speed == 0:
            dont_move = jnp.mean(rewards.tolerance(com_v, margin=2))
            return small_control * stand_reward * dont_move
        move = rewards.tolerance(
            jnp.linalg.norm(com_v),
            bounds=(self._move_speed, float("inf")),
            margin=self._move_speed, value_at_margin=0, sigmoid="linear")
        move = (5 * move + 1) / 6
        return small_control * stand_reward * move
