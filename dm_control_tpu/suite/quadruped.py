"""Quadruped domain (reference: dm_control/suite/quadruped.py).

Walk/run on a plane, escape a bumpy bowl (procedural heightfield terrain,
regenerated per episode as a model-array override), fetch a ball.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.quadruped import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.physics.model import JointType, SensorType
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
_TERRAIN_SMOOTHNESS = 0.15
_TERRAIN_BUMP_SCALE = 2
_TOES = ["toe_front_left", "toe_back_left", "toe_back_right",
         "toe_front_right"]
_WALLS = ["wall_px", "wall_py", "wall_nx", "wall_ny"]
SUITE = containers.TaggedTasks()


def _mutate(root, floor_size=None, terrain=False, rangefinders=False,
            walls_and_ball=False):
    """Reference quadruped.py make_model: prune task-specific content."""

    def remove_named(tag, name):
        for e in list(root.iter()):
            for c in list(e.children):
                if c.tag == tag and c.get("name") == name:
                    e.children.remove(c)

    if floor_size is not None:
        for e in root.iter():
            if e.tag == "geom" and e.get("name") == "floor":
                e.attrib["size"] = f"{floor_size} {floor_size} .5"
    if not walls_and_ball:
        for wall in _WALLS:
            remove_named("geom", wall)
        remove_named("body", "ball")
        remove_named("site", "target")
    if not terrain:
        remove_named("geom", "terrain")
    if not rangefinders:
        for e in root.iter():
            e.children[:] = [c for c in e.children
                             if c.tag != "rangefinder"]


def get_model(**kwargs):
    key = tuple(sorted(kwargs.items()))
    return compile_domain_model(
        MODEL, mutate=lambda r: _mutate(r, **kwargs), cache_key=key)


@SUITE.add()
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    m = get_model(floor_size=_DEFAULT_TIME_LIMIT * _WALK_SPEED)
    return control.Environment(
        m, Move(desired_speed=_WALK_SPEED), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add()
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    m = get_model(floor_size=_DEFAULT_TIME_LIMIT * _RUN_SPEED)
    return control.Environment(
        m, Move(desired_speed=_RUN_SPEED), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add()
def escape(time_limit=_DEFAULT_TIME_LIMIT, random=None,
           environment_kwargs=None):
    m = get_model(floor_size=40, terrain=True, rangefinders=True)
    return control.Environment(
        m, Escape(), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add()
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    m = get_model(walls_and_ball=True)
    return control.Environment(
        m, Fetch(), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


def _sensor_ids(m, *types):
    wanted = tuple(int(t) for t in types)
    return [s for s in range(m.nsensor) if m.sensor_type[s] in wanted]


def _sensor_slice(m, d, ids):
    idx = np.concatenate([
        np.arange(m.sensor_adr[s], m.sensor_adr[s] + m.sensor_dim[s])
        for s in ids]) if ids else np.zeros(0, np.int64)
    return d.sensordata[idx]


class _QuadrupedTask(base.Task):
    """Shared quadruped machinery (reference quadruped.py Physics + init)."""
    observation_stages = "acc"  # reads touch/force/imu sensors


    def _egocentric_state(self, m, d):
        hinges = [j for j in range(m.njnt)
                  if m.jnt_type[j] == int(JointType.HINGE)]
        qadr = np.array([m.jnt_qposadr[j] for j in hinges])
        dadr = np.array([m.jnt_dofadr[j] for j in hinges])
        return jnp.concatenate([d.qpos[qadr], d.qvel[dadr], d.act])

    def _common_observations(self, m, d):
        obs = collections.OrderedDict()
        obs["egocentric_state"] = self._egocentric_state(m, d)
        obs["torso_velocity"] = self.sensordata(m, d, "velocimeter")
        obs["torso_upright"] = self.xmat(m, d, "torso", "zz")
        obs["imu"] = _sensor_slice(m, d, _sensor_ids(
            m, SensorType.GYRO, SensorType.ACCELEROMETER))
        obs["force_torque"] = jnp.arcsinh(_sensor_slice(m, d, _sensor_ids(
            m, SensorType.FORCE, SensorType.TORQUE)))
        return obs

    def _upright_reward(self, m, d, deviation_angle=0):
        deviation = jnp.cos(jnp.deg2rad(deviation_angle))
        return rewards.tolerance(
            self.xmat(m, d, "torso", "zz"),
            bounds=(deviation, float("inf")), sigmoid="linear",
            margin=1 + deviation, value_at_margin=0)

    def _drop_to_ground(self, m, qpos, orientation, rc,
                        x_pos=0.0, y_pos=0.0, diff=None):
        """_find_non_contacting_height: raise the root in 1cm steps until
        contact-free (reference quadruped.py:248)."""
        from dm_control_tpu.physics import engine
        from dm_control_tpu.physics.model import make_data

        adr = m.jnt_qposadr[m.names.joint["root"]]
        mm = control.apply_model_diff(m, diff or {})

        if rc.is_numpy:
            qpos = np.asarray(qpos).copy()
            qpos[adr:adr + 3] = [x_pos, y_pos, 0.0]
            qpos[adr + 3:adr + 7] = orientation
            check = getattr(self, "_contact_check", None)
            if check is None or check[0] is not m:
                fn = jax.jit(lambda q, df: jnp.sum(
                    engine.fwd_position(
                        control.apply_model_diff(m, df),
                        make_data(m).replace(qpos=q)).contact.dist < 0))
                self._contact_check = (m, fn)
            fn = self._contact_check[1]
            z = 0.0
            for _ in range(10000):
                qpos[adr + 2] = z
                if int(fn(jnp.asarray(qpos), diff or {})) == 0:
                    break
                z += 0.01
            return qpos
        # jit path: while_loop on z
        qpos = qpos.at[adr:adr + 3].set(jnp.stack(
            [jnp.asarray(x_pos, qpos.dtype), jnp.asarray(y_pos, qpos.dtype),
             jnp.zeros((), qpos.dtype)]))
        qpos = qpos.at[adr + 3:adr + 7].set(orientation)
        d0 = make_data(m)

        def cond(carry):
            z, n = carry
            q = qpos.at[adr + 2].set(z)
            dd = engine.fwd_position(mm, d0.replace(qpos=q))
            return (jnp.sum(dd.contact.dist < 0) > 0) & (n < 1000)

        def body(carry):
            z, n = carry
            return z + 0.01, n + 1

        z, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), qpos.dtype),
                         jnp.asarray(0, jnp.int32)))
        return qpos.at[adr + 2].set(z)


class Move(_QuadrupedTask):
    def __init__(self, desired_speed):
        self._desired_speed = desired_speed

    def init(self, m, qpos, qvel, rc, diff):
        orientation = rc.randn(4)
        norm = (np.linalg.norm(orientation) if rc.is_numpy
                else jnp.linalg.norm(orientation))
        qpos = self._drop_to_ground(m, qpos, orientation / norm, rc,
                                    diff=diff)
        return qpos, qvel, diff

    def observation(self, m, d):
        return self._common_observations(m, d)

    def reward(self, m, d):
        move_reward = rewards.tolerance(
            self.sensordata(m, d, "velocimeter")[0],
            bounds=(self._desired_speed, float("inf")),
            margin=self._desired_speed, value_at_margin=0.5,
            sigmoid="linear")
        return self._upright_reward(m, d) * move_reward


class Escape(_QuadrupedTask):
    def initial_model_diff(self, m):
        return {"hfield_data": m.hfield_data}

    def init(self, m, qpos, qvel, rc, diff):
        res = m.hfield_nrow
        assert res == m.hfield_ncol
        row_grid, col_grid = np.ogrid[-1:1:res * 1j, -1:1:res * 1j]
        radius = np.clip(np.sqrt(col_grid ** 2 + row_grid ** 2), 0.04, 1)
        bowl_shape = 0.5 - np.cos(2 * np.pi * radius) / 2
        terrain_size = 2 * float(np.asarray(m.hfield_size)[0, 0])
        bump_res = int(terrain_size / _TERRAIN_BUMP_SCALE)
        bumps = rc.uniform(_TERRAIN_SMOOTHNESS, 1, (bump_res, bump_res))
        if rc.is_numpy:
            from scipy import ndimage

            smooth = ndimage.zoom(bumps, res / float(bump_res))
        else:
            smooth = jax.image.resize(bumps, (res, res), method="cubic")
        terrain = jnp.asarray(bowl_shape) * smooth
        diff = dict(diff, hfield_data=jnp.asarray(
            terrain, m.hfield_data.dtype))
        orientation = rc.randn(4)
        norm = (np.linalg.norm(orientation) if rc.is_numpy
                else jnp.linalg.norm(orientation))
        qpos = self._drop_to_ground(m, qpos, orientation / norm, rc,
                                    diff=diff)
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = self._common_observations(m, d)
        torso_frame = d.xmat[m.names.body["torso"]]
        torso_pos = d.xpos[m.names.body["torso"]]
        obs["origin"] = -(torso_pos @ torso_frame)
        rf = _sensor_slice(m, d, _sensor_ids(m, SensorType.RANGEFINDER))
        obs["rangefinder"] = jnp.where(rf == -1.0, 1.0, jnp.tanh(rf))
        return obs

    def reward(self, m, d):
        terrain_size = m.hfield_size[0, 0]
        origin_dist = jnp.linalg.norm(
            d.site_xpos[m.names.site["workspace"]])
        escape_reward = rewards.tolerance(
            origin_dist, bounds=(terrain_size, float("inf")),
            margin=terrain_size, value_at_margin=0, sigmoid="linear")
        return self._upright_reward(m, d, deviation_angle=20) * escape_reward


class Fetch(_QuadrupedTask):
    def init(self, m, qpos, qvel, rc, diff):
        # walker spawned randomly in the arena, ball tossed from above
        # (reference quadruped.py Fetch.initialize_episode)
        azimuth = rc.uniform(0, 2 * np.pi)
        orientation = (np.array if rc.is_numpy else jnp.array)(
            [np.cos(azimuth / 2) if rc.is_numpy else jnp.cos(azimuth / 2),
             0.0, 0.0,
             np.sin(azimuth / 2) if rc.is_numpy else jnp.sin(azimuth / 2)])
        spawn_radius = 0.9 * float(np.asarray(
            m.geom_size)[m.names.geom["floor"], 0])
        x_pos, y_pos = rc.uniform(-spawn_radius, spawn_radius, size=(2,))
        qpos = self._drop_to_ground(m, qpos, orientation, rc,
                                    x_pos=x_pos, y_pos=y_pos, diff=diff)
        ball_adr = m.jnt_qposadr[m.names.joint["ball_root"]]
        ball_dof = m.jnt_dofadr[m.names.joint["ball_root"]]
        bx, by = rc.uniform(-spawn_radius, spawn_radius, size=(2,))
        if rc.is_numpy:
            qpos = np.asarray(qpos).copy()
            qpos[ball_adr:ball_adr + 3] = [bx, by, 2.0]
            qvel = np.asarray(qvel).copy()
            qvel[ball_dof:ball_dof + 2] = 5 * rc.randn(2)
        else:
            qpos = qpos.at[ball_adr:ball_adr + 3].set(
                jnp.stack([bx, by, jnp.asarray(2.0, qpos.dtype)]))
            qvel = qvel.at[ball_dof:ball_dof + 2].set(5 * rc.randn(2))
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = self._common_observations(m, d)
        torso_frame = d.xmat[m.names.body["torso"]]
        torso_pos = d.xpos[m.names.body["torso"]]
        ball_rel_pos = d.xpos[m.names.body["ball"]] - torso_pos
        root_dof = m.jnt_dofadr[m.names.joint["root"]]
        ball_dof = m.jnt_dofadr[m.names.joint["ball_root"]]
        ball_rel_vel = (d.qvel[ball_dof:ball_dof + 3]
                        - d.qvel[root_dof:root_dof + 3])
        ball_rot_vel = d.qvel[ball_dof + 3:ball_dof + 6]
        ball_state = jnp.stack([ball_rel_pos, ball_rel_vel, ball_rot_vel])
        obs["ball_state"] = (ball_state @ torso_frame).ravel()
        torso_to_target = (d.site_xpos[m.names.site["target"]] - torso_pos)
        obs["target_position"] = torso_to_target @ torso_frame
        return obs

    def reward(self, m, d):
        arena_radius = m.geom_size[m.names.geom["floor"], 0] * jnp.sqrt(2.0)
        workspace_radius = m.site_size[m.names.site["workspace"], 0]
        ball_radius = m.geom_size[m.names.geom["ball"], 0]
        target_radius = m.site_size[m.names.site["target"], 0]
        workspace = d.site_xpos[m.names.site["workspace"]]
        ball_pos = d.xpos[m.names.body["ball"]]
        target_pos = d.site_xpos[m.names.site["target"]]
        reach_reward = rewards.tolerance(
            jnp.linalg.norm((workspace - ball_pos)[:2]),
            bounds=(0, workspace_radius + ball_radius), sigmoid="linear",
            margin=arena_radius, value_at_margin=0)
        fetch_reward = rewards.tolerance(
            jnp.linalg.norm((target_pos - ball_pos)[:2]),
            bounds=(0, target_radius), sigmoid="linear",
            margin=arena_radius, value_at_margin=0)
        reach_then_fetch = reach_reward * (0.5 + 0.5 * fetch_reward)
        return self._upright_reward(m, d) * reach_then_fetch
