"""Manipulator domain (reference: dm_control/suite/manipulator.py).

Planar arm bring/insert tasks with ball or peg props.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.manipulator import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_CLOSE = 0.01
_CONTROL_TIMESTEP = 0.01
_TIME_LIMIT = 10
_P_IN_HAND = 0.1
_P_IN_TARGET = 0.1
_ARM_JOINTS = ["arm_root", "arm_shoulder", "arm_elbow", "arm_wrist",
               "finger", "fingertip", "thumb", "thumbtip"]
_ALL_PROPS = frozenset(["ball", "target_ball", "cup", "peg", "target_peg",
                        "slot"])
_TOUCH_SENSORS = ["palm_touch", "finger_touch", "thumb_touch",
                  "fingertip_touch", "thumbtip_touch"]
SUITE = containers.TaggedTasks()


def _mutate(root, use_peg, insert):
    required = (["peg", "target_peg"] + (["slot"] if insert else [])
                if use_peg else
                ["ball", "target_ball"] + (["cup"] if insert else []))
    for prop in _ALL_PROPS.difference(required):
        for e in list(root.iter()):
            for c in list(e.children):
                if c.tag == "body" and c.get("name") == prop:
                    e.children.remove(c)


def get_model(use_peg, insert):
    return compile_domain_model(
        MODEL, mutate=lambda r: _mutate(r, use_peg, insert),
        cache_key=(use_peg, insert))


def _make(use_peg, insert, fully_observable, time_limit, random,
          environment_kwargs):
    m = get_model(use_peg, insert)
    task = Bring(use_peg=use_peg, insert=insert,
                 fully_observable=fully_observable)
    return control.Environment(
        m, task, control_timestep=_CONTROL_TIMESTEP, time_limit=time_limit,
        random=random, **(environment_kwargs or {}))


@SUITE.add("benchmarking", "hard")
def bring_ball(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
               environment_kwargs=None):
    return _make(False, False, fully_observable, time_limit, random,
                 environment_kwargs)


@SUITE.add("hard")
def bring_peg(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
              environment_kwargs=None):
    return _make(True, False, fully_observable, time_limit, random,
                 environment_kwargs)


@SUITE.add("hard")
def insert_ball(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
                environment_kwargs=None):
    return _make(False, True, fully_observable, time_limit, random,
                 environment_kwargs)


@SUITE.add("hard")
def insert_peg(fully_observable=True, time_limit=_TIME_LIMIT, random=None,
               environment_kwargs=None):
    return _make(True, True, fully_observable, time_limit, random,
                 environment_kwargs)


class Bring(base.Task):
    """Bring the prop to the target (reference manipulator.py Bring).

    The numpy-path episode init reproduces the reference's draw sequence,
    including the mid-init forward-kinematics query for the in-hand case.
    """
    observation_stages = "acc"  # reads touch/force/imu sensors


    max_reset_rejections = 100

    def __init__(self, use_peg, insert, fully_observable):
        self._use_peg = use_peg
        self._target = "target_peg" if use_peg else "target_ball"
        self._object = "peg" if use_peg else "ball"
        self._object_joints = [f"{self._object}_{dim}" for dim in "xzy"]
        self._receptacle = "slot" if use_peg else "cup"
        self._insert = insert
        self._fully_observable = fully_observable

    def initial_model_diff(self, m):
        return {"body_pos": m.body_pos, "body_quat": m.body_quat}

    def reject(self, m, d):
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def _fk_sites(self, m, qpos, diff):
        """site_xpos/xmat of the grasp site for the given qpos."""
        from dm_control_tpu.physics import engine, kinematics as kin
        from dm_control_tpu.physics.model import make_data

        mm = control.apply_model_diff(m, diff)
        d = kin.kinematics(mm, make_data(m).replace(
            qpos=jnp.asarray(qpos)))
        sid = m.names.site["grasp"]
        return d.site_xpos[sid], d.site_xmat[sid]

    def init(self, m, qpos, qvel, rc, diff):
        if not rc.is_numpy:
            return self._init_jax(m, qpos, qvel, rc, diff)
        uniform = rc.uniform
        qpos = np.asarray(qpos).copy()
        qvel = np.asarray(qvel).copy()
        jr = np.asarray(m.jnt_range)
        arm_ids = [m.names.joint[j] for j in _ARM_JOINTS]
        arm_qadr = np.array([m.jnt_qposadr[j] for j in arm_ids])
        is_limited = np.array([bool(m.jnt_limited[j]) for j in arm_ids])
        lower = np.where(is_limited, jr[arm_ids, 0], -np.pi)
        upper = np.where(is_limited, jr[arm_ids, 1], np.pi)
        angles = uniform(lower, upper)
        qpos[arm_qadr] = angles
        qpos[m.jnt_qposadr[m.names.joint["finger"]]] = \
            qpos[m.jnt_qposadr[m.names.joint["thumb"]]]
        target_x = uniform(-0.4, 0.4)
        target_z = uniform(0.1, 0.4)
        bp = np.asarray(diff["body_pos"]).copy()
        bq = np.asarray(diff["body_quat"]).copy()
        if self._insert:
            target_angle = uniform(-np.pi / 3, np.pi / 3)
            rid = m.names.body[self._receptacle]
            bp[rid, 0], bp[rid, 2] = target_x, target_z
            bq[rid, 0], bq[rid, 2] = (np.cos(target_angle / 2),
                                      np.sin(target_angle / 2))
        else:
            target_angle = uniform(-np.pi, np.pi)
        tid = m.names.body[self._target]
        bp[tid, 0], bp[tid, 2] = target_x, target_z
        bq[tid, 0], bq[tid, 2] = (np.cos(target_angle / 2),
                                  np.sin(target_angle / 2))
        diff = dict(diff, body_pos=jnp.asarray(bp), body_quat=jnp.asarray(bq))

        init_type = rc._np.choice(
            ["in_hand", "in_target", "uniform"],
            p=[_P_IN_HAND, _P_IN_TARGET, 1 - _P_IN_HAND - _P_IN_TARGET])
        if init_type == "in_target":
            object_x, object_z, object_angle = target_x, target_z, \
                target_angle
        elif init_type == "in_hand":
            spos, smat = self._fk_sites(m, qpos, diff)
            spos, smat = np.asarray(spos), np.asarray(smat)
            object_x, object_z = spos[0], spos[2]
            grasp_direction = [smat[0, 0], smat[2, 0]]
            object_angle = np.pi - np.arctan2(grasp_direction[1],
                                              grasp_direction[0])
        else:
            object_x = uniform(-0.5, 0.5)
            object_z = uniform(0, 0.7)
            object_angle = uniform(0, 2 * np.pi)
            qvel[m.jnt_dofadr[m.names.joint[self._object + "_x"]]] = \
                uniform(-5, 5)
        for name, val in zip(self._object_joints,
                             (object_x, object_z, object_angle)):
            qpos[m.jnt_qposadr[m.names.joint[name]]] = val
        return qpos, qvel, diff

    def _init_jax(self, m, qpos, qvel, rc, diff):
        """jit path: the in-hand/in-target choice becomes a branchless
        3-way select."""
        jr = m.jnt_range
        arm_ids = [m.names.joint[j] for j in _ARM_JOINTS]
        arm_qadr = jnp.asarray([m.jnt_qposadr[j] for j in arm_ids])
        is_limited = jnp.asarray([bool(m.jnt_limited[j]) for j in arm_ids])
        idsa = jnp.asarray(arm_ids)
        lower = jnp.where(is_limited, jr[idsa, 0], -jnp.pi)
        upper = jnp.where(is_limited, jr[idsa, 1], jnp.pi)
        angles = rc.uniform(lower, upper)
        qpos = qpos.at[arm_qadr].set(angles)
        qpos = qpos.at[m.jnt_qposadr[m.names.joint["finger"]]].set(
            qpos[m.jnt_qposadr[m.names.joint["thumb"]]])
        target_x = rc.uniform(-0.4, 0.4)
        target_z = rc.uniform(0.1, 0.4)
        if self._insert:
            target_angle = rc.uniform(-jnp.pi / 3, jnp.pi / 3)
            rid = m.names.body[self._receptacle]
            bp = diff["body_pos"].at[rid, 0].set(target_x) \
                .at[rid, 2].set(target_z)
            bq = diff["body_quat"].at[rid, 0].set(
                jnp.cos(target_angle / 2)).at[rid, 2].set(
                jnp.sin(target_angle / 2))
        else:
            target_angle = rc.uniform(-jnp.pi, jnp.pi)
            bp, bq = diff["body_pos"], diff["body_quat"]
        tid = m.names.body[self._target]
        bp = bp.at[tid, 0].set(target_x).at[tid, 2].set(target_z)
        bq = bq.at[tid, 0].set(jnp.cos(target_angle / 2)) \
            .at[tid, 2].set(jnp.sin(target_angle / 2))
        diff = dict(diff, body_pos=bp, body_quat=bq)

        u = rc.rand()
        spos, smat = self._fk_sites(m, qpos, diff)
        hand_angle = jnp.pi - jnp.arctan2(smat[2, 0], smat[0, 0])
        obj_ux = rc.uniform(-0.5, 0.5)
        obj_uz = rc.uniform(0.0, 0.7)
        obj_ua = rc.uniform(0.0, 2 * jnp.pi)
        vel_draw = rc.uniform(-5.0, 5.0)
        in_hand = u < _P_IN_HAND
        in_target = (u >= _P_IN_HAND) & (u < _P_IN_HAND + _P_IN_TARGET)
        object_x = jnp.where(in_hand, spos[0],
                             jnp.where(in_target, target_x, obj_ux))
        object_z = jnp.where(in_hand, spos[2],
                             jnp.where(in_target, target_z, obj_uz))
        object_angle = jnp.where(in_hand, hand_angle,
                                 jnp.where(in_target, target_angle, obj_ua))
        vdof = m.jnt_dofadr[m.names.joint[self._object + "_x"]]
        qvel = qvel.at[vdof].set(
            jnp.where(in_hand | in_target, 0.0, vel_draw))
        for name, val in zip(self._object_joints,
                             (object_x, object_z, object_angle)):
            qpos = qpos.at[m.jnt_qposadr[m.names.joint[name]]].set(val)
        return qpos, qvel, diff

    # -- observations / rewards --------------------------------------------

    def _site_distance(self, m, d, site1, site2):
        diff = (d.site_xpos[m.names.site[site1]]
                - d.site_xpos[m.names.site[site2]])
        return jnp.linalg.norm(diff)

    def _body_2d_pose(self, m, d, name, orientation=True):
        b = m.names.body[name]
        pos = d.xpos[b][jnp.array([0, 2])]
        if orientation:
            ori = d.xquat[b][jnp.array([0, 2])]
            return jnp.concatenate([pos, ori])
        return pos

    def observation(self, m, d):
        arm_ids = [m.names.joint[j] for j in _ARM_JOINTS]
        qadr = np.array([m.jnt_qposadr[j] for j in arm_ids])
        dadr = np.array([m.jnt_dofadr[j] for j in arm_ids])
        jp = d.qpos[qadr]
        obs = collections.OrderedDict()
        obs["arm_pos"] = jnp.stack([jnp.sin(jp), jnp.cos(jp)], -1)
        obs["arm_vel"] = d.qvel[dadr]
        touch = jnp.concatenate([self.sensordata(m, d, s)
                                 for s in _TOUCH_SENSORS])
        obs["touch"] = jnp.log1p(touch)
        if self._fully_observable:
            obs["hand_pos"] = self._body_2d_pose(m, d, "hand")
            obs["object_pos"] = self._body_2d_pose(m, d, self._object)
            ovel = np.array([m.jnt_dofadr[m.names.joint[j]]
                             for j in self._object_joints])
            obs["object_vel"] = d.qvel[ovel]
            obs["target_pos"] = self._body_2d_pose(m, d, self._target)
        return obs

    def _is_close(self, distance):
        return rewards.tolerance(distance, (0, _CLOSE), _CLOSE * 2)

    def reward(self, m, d):
        if self._use_peg:
            grasp = self._is_close(
                self._site_distance(m, d, "peg_grasp", "grasp"))
            pinch = self._is_close(
                self._site_distance(m, d, "peg_pinch", "pinch"))
            grasping = (grasp + pinch) / 2
            bring = self._is_close(
                self._site_distance(m, d, "peg", "target_peg"))
            bring_tip = self._is_close(
                self._site_distance(m, d, "target_peg_tip", "peg_tip"))
            bringing = (bring + bring_tip) / 2
            return jnp.maximum(bringing, grasping / 3)
        return self._is_close(
            self._site_distance(m, d, "ball", "target_ball"))
