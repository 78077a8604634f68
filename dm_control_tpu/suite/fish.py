"""Fish domain (reference: dm_control/suite/fish.py).

3D swimming driven by fluid drag (option density/viscosity)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.fish import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 40
_CONTROL_TIMESTEP = 0.04
_JOINTS = ["tail1", "tail_twist", "tail2", "finright_roll",
           "finright_pitch", "finleft_roll", "finleft_pitch"]
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking")
def upright(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Upright(), time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def swim(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Swim(), time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               random=random, **(environment_kwargs or {}))


class _FishTask(base.Task):
    def _joint_qpos_idx(self, m):
        return np.array([m.jnt_qposadr[m.names.joint[j]] for j in _JOINTS])

    def _joint_qvel_idx(self, m):
        return np.array([m.jnt_dofadr[m.names.joint[j]] for j in _JOINTS])

    def _init_pose(self, m, qpos, rc):
        quat = rc.randn(4)
        root_adr = m.jnt_qposadr[m.names.joint["root"]]
        if rc.is_numpy:
            qpos = np.asarray(qpos).copy()
            qpos[root_adr + 3:root_adr + 7] = quat / np.linalg.norm(quat)
            for j in _JOINTS:
                qpos[m.jnt_qposadr[m.names.joint[j]]] = rc.uniform(-0.2, 0.2)
        else:
            qpos = qpos.at[root_adr + 3:root_adr + 7].set(
                quat / jnp.linalg.norm(quat))
            for j in _JOINTS:
                qpos = qpos.at[m.jnt_qposadr[m.names.joint[j]]].set(
                    rc.uniform(-0.2, 0.2))
        return qpos

    def _upright(self, m, d):
        return self.xmat(m, d, "torso", "zz")


class Upright(_FishTask):
    def init(self, m, qpos, qvel, rc, diff):
        return self._init_pose(m, qpos, rc), qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["joint_angles"] = d.qpos[self._joint_qpos_idx(m)]
        obs["upright"] = self._upright(m, d)
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        return rewards.tolerance(self._upright(m, d), bounds=(1, 1),
                                 margin=1)


class Swim(_FishTask):
    def initial_model_diff(self, m):
        return {"geom_pos": m.geom_pos}

    def init(self, m, qpos, qvel, rc, diff):
        qpos = self._init_pose(m, qpos, rc)
        tid = m.names.geom["target"]
        gp = diff["geom_pos"]
        x = rc.uniform(-0.4, 0.4)
        y = rc.uniform(-0.4, 0.4)
        z = rc.uniform(0.1, 0.3)
        if rc.is_numpy:
            gp = np.asarray(gp).copy()
            gp[tid] = [x, y, z]
            gp = jnp.asarray(gp)
        else:
            gp = gp.at[tid].set(jnp.stack([x, y, z]))
        return qpos, qvel, dict(diff, geom_pos=gp)

    def _mouth_to_target(self, m, d):
        vec = (d.geom_xpos[m.names.geom["target"]]
               - d.geom_xpos[m.names.geom["mouth"]])
        return vec @ d.geom_xmat[m.names.geom["mouth"]]

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["joint_angles"] = d.qpos[self._joint_qpos_idx(m)]
        obs["upright"] = self._upright(m, d)
        obs["target"] = self._mouth_to_target(m, d)
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        radii = (m.geom_size[m.names.geom["mouth"], 0]
                 + m.geom_size[m.names.geom["target"], 0])
        in_target = rewards.tolerance(
            jnp.linalg.norm(self._mouth_to_target(m, d)),
            bounds=(0, radii), margin=2 * radii)
        is_upright = 0.5 * (self._upright(m, d) + 1)
        return (7 * in_target + is_upright) / 8
