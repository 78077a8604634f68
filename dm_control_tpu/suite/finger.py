"""Finger domain (reference: dm_control/suite/finger.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.finger import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_EASY_TARGET_SIZE = 0.07
_HARD_TARGET_SIZE = 0.03
_SPIN_VELOCITY = 15.0
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking")
def spin(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Spin(), time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def turn_easy(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Turn(_EASY_TARGET_SIZE),
                               time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def turn_hard(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
    m = get_model()
    return control.Environment(m, Turn(_HARD_TARGET_SIZE),
                               time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               random=random, **(environment_kwargs or {}))


class _FingerTask(base.Task):
    """Shared accessors (reference finger.py Physics)."""
    observation_stages = "acc"  # reads touch/force/imu sensors


    max_reset_rejections = 1000

    def reject(self, m, d):
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def initial_model_diff(self, m):
        # spin/turn set hinge damping to 0.03 at episode init
        # (reference finger.py:initialize_episode)
        dof = np.asarray(m.dof_damping).copy()
        dof[m.jnt_dofadr[m.names.joint["hinge"]]] = 0.03
        return {"dof_damping": jnp.asarray(dof)}

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def reject_reinit(self, m, qpos, qvel, rc, diff):
        # reference _set_random_joint_angles re-draws joints only
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def _sens(self, m, d, name):
        return self.sensordata(m, d, name)

    def _tip_position(self, m, d):
        return (self._sens(m, d, "tip")[jnp.array([0, 2])]
                - self._sens(m, d, "spinner")[jnp.array([0, 2])])

    def _bounded_position(self, m, d):
        return jnp.concatenate([
            self._sens(m, d, "proximal"), self._sens(m, d, "distal"),
            self._tip_position(m, d)])

    def _velocity(self, m, d):
        return jnp.concatenate([
            self._sens(m, d, "proximal_velocity"),
            self._sens(m, d, "distal_velocity"),
            self._sens(m, d, "hinge_velocity")])

    def _touch(self, m, d):
        return jnp.log1p(jnp.concatenate([
            self._sens(m, d, "touchtop"), self._sens(m, d, "touchbottom")]))


class Spin(_FingerTask):
    """Spin the body attached to the hinge (reference finger.py Spin)."""

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = self._bounded_position(m, d)
        obs["velocity"] = self._velocity(m, d)
        obs["touch"] = self._touch(m, d)
        return obs

    def reward(self, m, d):
        hinge_vel = self._sens(m, d, "hinge_velocity")[0]
        return (hinge_vel <= -_SPIN_VELOCITY).astype(d.qpos.dtype)


class Turn(_FingerTask):
    """Turn the spinner so its tip faces the target."""

    def __init__(self, target_radius):
        self._target_radius = target_radius

    def initial_model_diff(self, m):
        diff = super().initial_model_diff(m)
        size = np.asarray(m.site_size).copy()
        size[m.names.site["target"], 0] = self._target_radius
        return dict(diff, site_size=jnp.asarray(size),
                    site_pos=m.site_pos)

    def init(self, m, qpos, qvel, rc, diff):
        target_angle = rc.uniform(-np.pi, np.pi)
        # hinge anchor at model config (the spinner axis is fixed in world
        # x/z since its ancestors are static until the hinge)
        from dm_control_tpu.physics import engine, model as pm

        jid = m.names.joint["hinge"]
        # anchor from qpos0 geometry: body chain above the hinge is static
        body = m.jnt_bodyid[jid]
        # accumulate static ancestor frame
        import numpy as onp

        pos = onp.zeros(3)
        chain = []
        b = body
        while b != 0:
            chain.append(b)
            b = m.body_parentid[b]
        for b in reversed(chain):
            pos = pos + onp.asarray(m.body_pos)[b]
        anchor = pos + onp.asarray(m.jnt_pos)[jid]
        hinge_x, hinge_z = anchor[0], anchor[2]
        cap1 = m.names.geom["cap1"]
        radius = float(np.sum(np.asarray(m.geom_size)[cap1]))
        target_x = hinge_x + radius * jnp.sin(target_angle)
        target_z = hinge_z + radius * jnp.cos(target_angle)
        sid = m.names.site["target"]
        sp = diff["site_pos"]
        if rc.is_numpy:
            sp = np.asarray(sp).copy()
            sp[sid, 0] = float(target_x)
            sp[sid, 2] = float(target_z)
            sp = jnp.asarray(sp)
        else:
            sp = sp.at[sid, 0].set(target_x).at[sid, 2].set(target_z)
        diff = dict(diff, site_pos=sp)
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        return qpos, qvel, diff

    def _dist_to_target(self, m, d):
        target_pos = (self._sens(m, d, "target")[jnp.array([0, 2])]
                      - self._sens(m, d, "spinner")[jnp.array([0, 2])])
        to_target = target_pos - self._tip_position(m, d)
        return (jnp.linalg.norm(to_target)
                - m.site_size[m.names.site["target"], 0])

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = self._bounded_position(m, d)
        obs["velocity"] = self._velocity(m, d)
        obs["touch"] = self._touch(m, d)
        target_pos = (self._sens(m, d, "target")[jnp.array([0, 2])]
                      - self._sens(m, d, "spinner")[jnp.array([0, 2])])
        obs["target_position"] = target_pos
        obs["dist_to_target"] = self._dist_to_target(m, d)
        return obs

    def reward(self, m, d):
        return (self._dist_to_target(m, d) <= 0).astype(d.qpos.dtype)
