"""Stacker domain (reference: dm_control/suite/stacker.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.stacker import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_CLOSE = 0.01
_CONTROL_TIMESTEP = 0.01
_TIME_LIMIT = 10
_ARM_JOINTS = ["arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
               "finger", "fingertip", "thumb", "thumbtip"]
SUITE = containers.TaggedTasks()


def _mutate(root, n_boxes):
    for b in range(n_boxes, 4):
        name = f"box{b}"
        for e in list(root.iter()):
            for c in list(e.children):
                if c.tag == "body" and c.get("name") == name:
                    e.children.remove(c)


def get_model(n_boxes):
    return compile_domain_model(
        MODEL, mutate=lambda r: _mutate(r, n_boxes), cache_key=n_boxes)


def _make(n_boxes, fully_observable, time_limit, random,
          environment_kwargs):
    m = get_model(n_boxes)
    return control.Environment(
        m, Stack(n_boxes=n_boxes, fully_observable=fully_observable),
        control_timestep=_CONTROL_TIMESTEP, time_limit=time_limit,
        random=random, **(environment_kwargs or {}))


@SUITE.add("hard")
def stack_2(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _make(2, fully_observable, time_limit, random,
                 environment_kwargs)


@SUITE.add("hard")
def stack_4(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _make(4, fully_observable, time_limit, random,
                 environment_kwargs)


class Stack(base.Task):
    """Stack boxes near the target (reference stacker.py Stack)."""
    observation_stages = "acc"  # reads touch/force/imu sensors


    max_reset_rejections = 100

    def __init__(self, n_boxes, fully_observable):
        self._n_boxes = n_boxes
        self._box_names = [f"box{b}" for b in range(n_boxes)]
        self._box_joint_names = [f"{name}_{dim}"
                                 for name in self._box_names
                                 for dim in "xyz"]
        self._fully_observable = fully_observable

    def initial_model_diff(self, m):
        return {"body_pos": m.body_pos}

    def reject(self, m, d):
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def init(self, m, qpos, qvel, rc, diff):
        arm_ids = [m.names.joint[j] for j in _ARM_JOINTS]
        arm_qadr = np.array([m.jnt_qposadr[j] for j in arm_ids])
        jr = np.asarray(m.jnt_range)
        is_limited = np.array([bool(m.jnt_limited[j]) for j in arm_ids])
        lower = np.where(is_limited, jr[arm_ids, 0], -np.pi)
        upper = np.where(is_limited, jr[arm_ids, 1], np.pi)
        angles = rc.uniform(lower, upper)
        tgt = m.names.body["target"]
        box_size = float(np.asarray(m.geom_size)[m.names.geom["target"], 0])
        if rc.is_numpy:
            qpos = np.asarray(qpos).copy()
            qpos[arm_qadr] = angles
            qpos[m.jnt_qposadr[m.names.joint["finger"]]] = \
                qpos[m.jnt_qposadr[m.names.joint["thumb"]]]
            target_height = 2 * rc._np.randint(self._n_boxes) + 1
            bp = np.asarray(diff["body_pos"]).copy()
            bp[tgt, 2] = box_size * target_height
            bp[tgt, 0] = rc.uniform(-0.37, 0.37)
            for name in self._box_names:
                qpos[m.jnt_qposadr[m.names.joint[name + "_x"]]] = \
                    rc.uniform(0.1, 0.3)
                qpos[m.jnt_qposadr[m.names.joint[name + "_z"]]] = \
                    rc.uniform(0, 0.7)
                qpos[m.jnt_qposadr[m.names.joint[name + "_y"]]] = \
                    rc.uniform(0, 2 * np.pi)
            diff = dict(diff, body_pos=jnp.asarray(bp))
        else:
            import jax

            qpos = qpos.at[jnp.asarray(arm_qadr)].set(angles)
            qpos = qpos.at[m.jnt_qposadr[m.names.joint["finger"]]].set(
                qpos[m.jnt_qposadr[m.names.joint["thumb"]]])
            height_draw = jax.random.randint(rc._next(), (),
                                             0, self._n_boxes)
            target_height = 2 * height_draw + 1
            bp = diff["body_pos"].at[tgt, 2].set(box_size * target_height)
            bp = bp.at[tgt, 0].set(rc.uniform(-0.37, 0.37))
            for name in self._box_names:
                qpos = qpos.at[m.jnt_qposadr[
                    m.names.joint[name + "_x"]]].set(rc.uniform(0.1, 0.3))
                qpos = qpos.at[m.jnt_qposadr[
                    m.names.joint[name + "_z"]]].set(rc.uniform(0, 0.7))
                qpos = qpos.at[m.jnt_qposadr[
                    m.names.joint[name + "_y"]]].set(
                    rc.uniform(0, 2 * np.pi))
            diff = dict(diff, body_pos=bp)
        return qpos, qvel, diff

    def observation(self, m, d):
        arm_ids = [m.names.joint[j] for j in _ARM_JOINTS]
        qadr = np.array([m.jnt_qposadr[j] for j in arm_ids])
        dadr = np.array([m.jnt_dofadr[j] for j in arm_ids])
        jp = d.qpos[qadr]
        obs = collections.OrderedDict()
        obs["arm_pos"] = jnp.stack([jnp.sin(jp), jnp.cos(jp)], -1)
        obs["arm_vel"] = d.qvel[dadr]
        obs["touch"] = jnp.log1p(d.sensordata)
        if self._fully_observable:
            def pose2d(name, orientation=True):
                b = m.names.body[name]
                pos = d.xpos[b][jnp.array([0, 2])]
                if orientation:
                    return jnp.concatenate(
                        [pos, d.xquat[b][jnp.array([0, 2])]])
                return pos

            obs["hand_pos"] = pose2d("hand")
            obs["box_pos"] = jnp.stack(
                [pose2d(n) for n in self._box_names])
            bvel = np.array([m.jnt_dofadr[m.names.joint[j]]
                             for j in self._box_joint_names])
            obs["box_vel"] = d.qvel[bvel]
            obs["target_pos"] = pose2d("target", orientation=False)
        return obs

    def reward(self, m, d):
        box_size = m.geom_size[m.names.geom["target"], 0]
        target = d.site_xpos[m.names.site["target"]]
        dists = [jnp.linalg.norm(d.site_xpos[m.names.site[n]] - target)
                 for n in self._box_names]
        box_is_close = rewards.tolerance(
            jnp.min(jnp.stack(dists)), margin=2 * box_size)
        hand_to_target = jnp.linalg.norm(
            d.site_xpos[m.names.site["grasp"]] - target)
        hand_is_far = rewards.tolerance(
            hand_to_target, bounds=(0.1, float("inf")), margin=_CLOSE)
        return box_is_close * hand_is_far
