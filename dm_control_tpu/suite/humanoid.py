"""Humanoid domain (reference: dm_control/suite/humanoid.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.humanoid import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 25
_CONTROL_TIMESTEP = 0.025
_STAND_HEIGHT = 1.4
_WALK_SPEED = 1
_RUN_SPEED = 10
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


def _env(move_speed, pure_state, time_limit, random, environment_kwargs):
    m = get_model()
    return control.Environment(
        m, Humanoid(move_speed=move_speed, pure_state=pure_state),
        time_limit=time_limit, control_timestep=_CONTROL_TIMESTEP,
        random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    return _env(0, False, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    return _env(_WALK_SPEED, False, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    return _env(_RUN_SPEED, False, time_limit, random, environment_kwargs)


@SUITE.add()
def run_pure_state(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
    return _env(_RUN_SPEED, True, time_limit, random, environment_kwargs)


class Humanoid(base.Task):
    """Stand/walk/run (reference humanoid.py Humanoid); initial pose
    rejection-sampled until penetration-free."""

    max_reset_rejections = 100

    def __init__(self, move_speed, pure_state):
        self._move_speed = move_speed
        self._pure_state = pure_state

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def reject(self, m, d):
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def _com_velocity(self, m, d):
        return self.sensordata(m, d, "torso_subtreelinvel")

    def _head_height(self, m, d):
        return self.xpos(m, d, "head", "z")

    def observation(self, m, d):
        obs = collections.OrderedDict()
        if self._pure_state:
            obs["position"] = d.qpos
            obs["velocity"] = d.qvel
            return obs
        obs["joint_angles"] = d.qpos[7:]
        obs["head_height"] = self._head_height(m, d)
        torso_frame = d.xmat[m.names.body["torso"]]
        torso_pos = d.xpos[m.names.body["torso"]]
        positions = []
        for side in ("left_", "right_"):
            for limb in ("hand", "foot"):
                torso_to_limb = d.xpos[m.names.body[side + limb]] - torso_pos
                positions.append(torso_to_limb @ torso_frame)
        obs["extremities"] = jnp.concatenate(positions)
        # xmat['torso', ['zx','zy','zz']] = third row of the rotation matrix
        obs["torso_vertical"] = d.xmat[m.names.body["torso"], 2, :]
        obs["com_velocity"] = self._com_velocity(m, d)
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        standing = rewards.tolerance(
            self._head_height(m, d),
            bounds=(_STAND_HEIGHT, float("inf")), margin=_STAND_HEIGHT / 4)
        upright = rewards.tolerance(
            self.xmat(m, d, "torso", "zz"),
            bounds=(0.9, float("inf")), sigmoid="linear",
            margin=1.9, value_at_margin=0)
        stand_reward = standing * upright
        small_control = jnp.mean(rewards.tolerance(
            d.ctrl, margin=1, value_at_margin=0, sigmoid="quadratic"))
        small_control = (4 + small_control) / 5
        com_v = self._com_velocity(m, d)[:2]
        if self._move_speed == 0:
            dont_move = jnp.mean(rewards.tolerance(com_v, margin=2))
            return small_control * stand_reward * dont_move
        move = rewards.tolerance(
            jnp.linalg.norm(com_v),
            bounds=(self._move_speed, float("inf")),
            margin=self._move_speed, value_at_margin=0, sigmoid="linear")
        move = (5 * move + 1) / 6
        return small_control * stand_reward * move
