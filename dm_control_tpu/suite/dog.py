"""Dog domain (reference: dm_control/suite/dog.py).

The runtime model is mesh-free: the reference's 162 STL bone meshes are
visual-only (class "bone" sets contype=conaffinity=0, dog.xml:14) and
their mass model is baked into explicit <inertial> elements at modelgen
time (see suite/_doggen.py); all contacts go through the same primitive
capsules/spheres/ellipsoids/boxes the reference uses.
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import kinematics as kin
from dm_control_tpu.physics import sensors
from dm_control_tpu.physics.model import JointType, make_data
from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.dog import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 15
_CONTROL_TIMESTEP = .015

# Angle (in degrees) of local z from global z below which upright reward
# is 1 (reference dog.py:38).
_MAX_UPRIGHT_ANGLE = 30
_MIN_UPRIGHT_COSINE = np.cos(np.deg2rad(_MAX_UPRIGHT_ANGLE))

_STAND_HEIGHT_FRACTION = 0.9
_WALK_SPEED = 1
_TROT_SPEED = 3
_RUN_SPEED = 9

SUITE = containers.TaggedTasks()


def _make_model(floor_size, remove_ball):
    """Floor sizing + optional ball/target/wall removal
    (reference dog.py:61 ``make_model``)."""

    def mutate(root):
        floor = root.find("geom", "floor")
        floor.attrib["size"] = f"{floor_size} {floor_size} .1"
        if remove_ball:
            ball = root.find("body", "ball")
            ball.parent.remove(ball)
            for tag, name in (("geom", "target"), ("camera", "ball"),
                              ("camera", "head")):
                el = root.find(tag, name)
                el.parent.remove(el)
            for wall in ("px", "nx", "py", "ny"):
                el = root.find("geom", "wall_" + wall)
                el.parent.remove(el)

    return compile_domain_model(MODEL, mutate=mutate,
                                cache_key=(floor_size, remove_ball))


def _env(task, floor_size, remove_ball, time_limit, random,
         environment_kwargs):
    m = _make_model(floor_size, remove_ball)
    return control.Environment(
        m, task, time_limit=time_limit, control_timestep=_CONTROL_TIMESTEP,
        random=random, **(environment_kwargs or {}))


@SUITE.add("no_reward_visualization")
def stand(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    floor_size = _WALK_SPEED * _DEFAULT_TIME_LIMIT
    return _env(Stand(), floor_size, True, time_limit, random,
                environment_kwargs)


@SUITE.add("no_reward_visualization")
def walk(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    floor_size = _WALK_SPEED * _DEFAULT_TIME_LIMIT
    return _env(Move(_WALK_SPEED), floor_size, True, time_limit, random,
                environment_kwargs)


@SUITE.add("no_reward_visualization")
def trot(time_limit=_DEFAULT_TIME_LIMIT, random=None,
         environment_kwargs=None):
    floor_size = _TROT_SPEED * _DEFAULT_TIME_LIMIT
    return _env(Move(_TROT_SPEED), floor_size, True, time_limit, random,
                environment_kwargs)


@SUITE.add("no_reward_visualization")
def run(time_limit=_DEFAULT_TIME_LIMIT, random=None,
        environment_kwargs=None):
    floor_size = _RUN_SPEED * _DEFAULT_TIME_LIMIT
    return _env(Move(_RUN_SPEED), floor_size, True, time_limit, random,
                environment_kwargs)


@SUITE.add("no_reward_visualization", "hard")
def fetch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    return _env(Fetch(), 10, False, time_limit, random, environment_kwargs)


# -- model-derived constants (reference computes these per episode at the
#    default pose, dog.py:276-283; they are deterministic per model) --------


_POSE_CONSTS = {}


def _pose_consts(m):
    key = id(m)
    if key not in _POSE_CONSTS:
        d = kin.kinematics(m, make_data(m))
        xpos = np.asarray(d.xpos)
        torso, pelvis = m.names.body["torso"], m.names.body["pelvis"]
        stand_height = xpos[[torso, pelvis], 2] * _STAND_HEIGHT_FRACTION
        body_weight = (-float(np.asarray(m.opt.gravity)[2])
                       * float(np.asarray(m.body_subtreemass)[torso]))
        _POSE_CONSTS[key] = (stand_height, body_weight)
    return _POSE_CONSTS[key]


def _hinge_addrs(m):
    qadr = np.array([m.jnt_qposadr[j] for j in range(m.njnt)
                     if m.jnt_type[j] == int(JointType.HINGE)], np.int32)
    vadr = np.array([m.jnt_dofadr[j] for j in range(m.njnt)
                     if m.jnt_type[j] == int(JointType.HINGE)], np.int32)
    return qadr, vadr


class Stand(base.Task):
    """Upright-posture task (reference dog.py:250 ``Stand``)."""
    observation_stages = "acc"  # reads touch/force/imu sensors


    def __init__(self, observe_reward_factors=False):
        self._observe_reward_factors = observe_reward_factors

    # -- episode init (RandomState call sequence matches dog.py:264-296) ----

    def init(self, m, qpos, qvel, rc, diff):
        _pose_consts(m)  # host-side precompute (reward reads the cache
        # inside jit, where jnp ops would be staged as tracers)
        azimuth = rc.uniform(0, 2 * np.pi)
        qpos[3:7] = (np.cos(azimuth / 2), 0, 0, np.sin(azimuth / 2))
        qvel[0] = 2 * rc.randn()
        qvel[1] = 2 * rc.randn()
        qvel[5] = 2 * rc.randn()
        return qpos, qvel, diff

    def init_act(self, m, rc):
        cr = np.asarray(m.actuator_ctrlrange)
        return np.array([rc.uniform(cr[i, 0], cr[i, 1])
                         for i in range(m.nu)])

    # -- semantic accessors (reference dog.py:159-246 ``Physics``) ----------

    def torso_pelvis_height(self, m, d):
        return d.xpos[jnp.array([m.names.body["torso"],
                                 m.names.body["pelvis"]]), 2]

    def z_projection(self, m, d):
        ids = jnp.array([m.names.body["skull"], m.names.body["torso"],
                         m.names.body["pelvis"]])
        return d.xmat[ids, 2, :]

    def upright(self, m, d):
        return self.z_projection(m, d)[:, 2]

    def torso_com_velocity(self, m, d):
        v = self.sensordata(m, d, "torso_linvel")
        frame = d.xmat[m.names.body["torso"]]
        return v @ frame

    def com_forward_velocity(self, m, d):
        return self.torso_com_velocity(m, d)[0]

    def joint_angles(self, m, d):
        return d.qpos[_hinge_addrs(m)[0]]

    def joint_velocities(self, m, d):
        return d.qvel[_hinge_addrs(m)[1]]

    def inertial_sensors(self, m, d):
        return jnp.concatenate([self.sensordata(m, d, s) for s in
                                ("accelerometer", "velocimeter", "gyro")])

    def touch_sensors(self, m, d):
        return jnp.stack([self.sensordata(m, d, s)[0] for s in
                          ("palm_L", "palm_R", "sole_L", "sole_R")])

    def foot_forces(self, m, d):
        return jnp.concatenate([self.sensordata(m, d, s) for s in
                                ("foot_L", "foot_R", "hand_L", "hand_R")])

    # -- observation / reward ------------------------------------------------

    def observation_components(self, m, d):
        obs = collections.OrderedDict()
        obs["joint_angles"] = self.joint_angles(m, d)
        # reference key has this typo (dog.py:300)
        obs["joint_velocites"] = self.joint_velocities(m, d)
        obs["torso_pelvis_height"] = self.torso_pelvis_height(m, d)
        obs["z_projection"] = self.z_projection(m, d).ravel()
        obs["torso_com_velocity"] = self.torso_com_velocity(m, d)
        obs["inertial_sensors"] = self.inertial_sensors(m, d)
        obs["foot_forces"] = self.foot_forces(m, d)
        obs["touch_sensors"] = self.touch_sensors(m, d)
        obs["actuator_state"] = d.act
        return obs

    def observation(self, m, d):
        obs = self.observation_components(m, d)
        if self._observe_reward_factors:
            obs["reward_factors"] = self.reward_factors(m, d)
        return obs

    def reward_factors(self, m, d):
        stand_height, body_weight = _pose_consts(m)
        height = self.torso_pelvis_height(m, d)
        torso = rewards.tolerance(height[0],
                                  bounds=(stand_height[0], float("inf")),
                                  margin=stand_height[0])
        pelvis = rewards.tolerance(height[1],
                                   bounds=(stand_height[1], float("inf")),
                                   margin=stand_height[1])
        upright = rewards.tolerance(self.upright(m, d),
                                    bounds=(_MIN_UPRIGHT_COSINE, float("inf")),
                                    sigmoid="linear",
                                    margin=_MIN_UPRIGHT_COSINE + 1,
                                    value_at_margin=0)
        touch = rewards.tolerance(jnp.sum(self.touch_sensors(m, d)),
                                  bounds=(body_weight, float("inf")),
                                  margin=body_weight,
                                  sigmoid="linear",
                                  value_at_margin=0.9)
        return jnp.concatenate([jnp.atleast_1d(torso),
                                jnp.atleast_1d(pelvis),
                                jnp.atleast_1d(upright),
                                jnp.atleast_1d(touch)])

    def reward(self, m, d):
        return jnp.prod(self.reward_factors(m, d))


class Move(Stand):
    """Locomotion at a target speed (reference dog.py:349 ``Move``)."""

    def __init__(self, move_speed, observe_reward_factors=False):
        self._move_speed = move_speed
        super().__init__(observe_reward_factors)

    def reward_factors(self, m, d):
        standing = super().reward_factors(m, d)
        speed_margin = max(1.0, self._move_speed)
        forward = rewards.tolerance(self.com_forward_velocity(m, d),
                                    bounds=(self._move_speed,
                                            2 * self._move_speed),
                                    margin=speed_margin,
                                    value_at_margin=0,
                                    sigmoid="linear")
        forward = (4 * forward + 1) / 5
        return jnp.concatenate([standing, jnp.atleast_1d(forward)])


class Fetch(Stand):
    """Fetch a thrown ball to the target (reference dog.py:381 ``Fetch``)."""

    def init(self, m, qpos, qvel, rc, diff):
        qpos, qvel, diff = super().init(m, qpos, qvel, rc, diff)
        floor_half = float(np.asarray(m.geom_size)[m.names.geom["floor"], 0])
        radius = 0.75 * floor_half
        azimuth = rc.uniform(0, 2 * np.pi)
        ball_q = m.jnt_qposadr[m.names.joint["ball_root"]]
        ball_v = m.jnt_dofadr[m.names.joint["ball_root"]]
        qpos[ball_q:ball_q + 3] = (radius * np.sin(azimuth),
                                   radius * np.cos(azimuth), 0.05)
        vertical_height = rc.uniform(0, 3)
        gravity = -float(np.asarray(m.opt.gravity)[2])
        vertical_velocity = np.sqrt(2 * gravity * vertical_height)
        horizontal_speed = rc.uniform(0, 5)
        direction = np.array((-np.sin(azimuth) + 0.05 * rc.randn(),
                              -np.cos(azimuth) + 0.05 * rc.randn()))
        qvel[ball_v:ball_v + 3] = (horizontal_speed * direction[0],
                                   horizontal_speed * direction[1],
                                   vertical_velocity)
        return qpos, qvel, diff

    def ball_in_head_frame(self, m, d):
        head = m.names.site["head"]
        ball_g = m.names.geom["ball"]
        head_frame = d.site_xmat[head]
        head_to_ball = d.geom_xpos[ball_g] - d.site_xpos[head]
        head_vel = sensors._point_vel(
            m, d, d.site_xpos[head], m.site_bodyid[head])[3:]
        ball_vel = sensors._point_vel(
            m, d, d.geom_xpos[ball_g], m.geom_bodyid[ball_g])[3:]
        head_to_ball_vel = ball_vel - head_vel
        return jnp.concatenate([head_to_ball @ head_frame,
                                head_to_ball_vel @ head_frame])

    def target_in_head_frame(self, m, d):
        head = m.names.site["head"]
        head_frame = d.site_xmat[head]
        head_to_target = (d.geom_xpos[m.names.geom["target"]]
                          - d.site_xpos[head])
        return head_to_target @ head_frame

    def ball_to_mouth_distance(self, m, d):
        ball = d.geom_xpos[m.names.geom["ball"]]
        upper = jnp.linalg.norm(ball - d.site_xpos[m.names.site["upper_bite"]])
        lower = jnp.linalg.norm(ball - d.site_xpos[m.names.site["lower_bite"]])
        return 0.5 * (upper + lower)

    def ball_to_target_distance(self, m, d):
        return jnp.linalg.norm(d.geom_xpos[m.names.geom["ball"]]
                               - d.geom_xpos[m.names.geom["target"]])

    def observation_components(self, m, d):
        obs = super().observation_components(m, d)
        obs["ball_state"] = self.ball_in_head_frame(m, d)
        obs["target_position"] = self.target_in_head_frame(m, d)
        return obs

    def reward_factors(self, m, d):
        standing = super().reward_factors(m, d)
        gsz = np.asarray(m.geom_size)
        bite_radius = float(
            np.asarray(m.site_size)[m.names.site["upper_bite"], 0])
        reach_ball = rewards.tolerance(self.ball_to_mouth_distance(m, d),
                                       bounds=(0, bite_radius),
                                       sigmoid="reciprocal", margin=2)
        reach_ball = (6 * reach_ball + 1) / 7
        target_radius = gsz[m.names.geom["target"], 0]
        bring_margin = gsz[m.names.geom["floor"], 0]
        dist = self.ball_to_target_distance(m, d)
        ball_near_target = rewards.tolerance(
            dist, bounds=(0, target_radius), sigmoid="reciprocal",
            margin=bring_margin)
        fetch_ball = (ball_near_target + 1) / 2
        # release the ball once fetched (reference dog.py:452-453) —
        # data-dependent, so a where() instead of Python branching
        reach_ball = jnp.where(dist < 2 * target_radius, 1.0, reach_ball)
        return jnp.concatenate([standing, jnp.atleast_1d(reach_ball),
                                jnp.atleast_1d(fetch_ball)])
