"""Swimmer domain (reference: dm_control/suite/swimmer.py).

Procedural n-link swimmer propelled by fluid drag (option density/viscosity).
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.swimmer import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.suite.utils import randomizers
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 30
_CONTROL_TIMESTEP = 0.03
SUITE = containers.TaggedTasks()


def _extend(root, n_bodies):
    """Builds the n-link chain (reference swimmer.py:_make_model)."""
    if n_bodies < 3:
        raise ValueError(f"At least 3 bodies required. Received {n_bodies}")
    wb = root.first("worldbody")
    head = next(b for b in wb.children if b.tag == "body")
    actuator = root.add("actuator")
    sensor = root.first("sensor") or root.add("sensor")
    parent = head
    joint_limit = 360.0 / n_bodies
    for i in range(n_bodies - 1):
        child = parent.add("body", name=f"segment_{i}", pos="0 .1 0")
        child.add("geom", **{"class": "visual", "name": f"visual_{i}"})
        child.add("geom", **{"class": "inertial", "name": f"inertial_{i}"})
        child.add("site", name=f"site_{i}")
        child.add("joint", name=f"joint_{i}",
                  range=f"{-joint_limit} {joint_limit}")
        actuator.add("motor", name=f"motor_{i}", joint=f"joint_{i}")
        sensor.add("velocimeter", name=f"velocimeter_{i}", site=f"site_{i}")
        sensor.add("gyro", name=f"gyro_{i}", site=f"site_{i}")
        parent = child


def get_model(n_links):
    return compile_domain_model(
        MODEL, mutate=lambda r: _extend(r, n_links), cache_key=n_links)


def _env(n_links, time_limit, random, environment_kwargs):
    m = get_model(n_links)
    return control.Environment(
        m, Swimmer(), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def swimmer6(time_limit=_DEFAULT_TIME_LIMIT, random=None,
             environment_kwargs=None):
    return _env(6, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def swimmer15(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
    return _env(15, time_limit, random, environment_kwargs)


def swimmer(n_links=3, time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _env(n_links, time_limit, random, environment_kwargs)


class Swimmer(base.Task):
    """Swim the nose to the target (reference swimmer.py Swimmer)."""

    def initial_model_diff(self, m):
        return {"geom_pos": m.geom_pos}

    def init(self, m, qpos, qvel, rc, diff):
        qpos = randomizers.randomize_limited_and_rotational_joints(
            m, qpos, rc)
        close_target = rc.rand() < 0.2
        gp = diff["geom_pos"]
        tid = m.names.geom["target"]
        if rc.is_numpy:
            target_box = 0.3 if bool(close_target) else 2.0
            xpos, ypos = rc.uniform(-target_box, target_box, size=2)
            gp = np.asarray(gp).copy()
            gp[tid, 0] = xpos
            gp[tid, 1] = ypos
            gp = jnp.asarray(gp)
        else:
            target_box = jnp.where(close_target, 0.3, 2.0)
            xy = rc.uniform(-1.0, 1.0, size=2) * target_box
            gp = gp.at[tid, 0].set(xy[0]).at[tid, 1].set(xy[1])
        return qpos, qvel, dict(diff, geom_pos=gp)

    def _nose_to_target(self, m, d):
        nose_to_target = (d.geom_xpos[m.names.geom["target"]]
                          - d.geom_xpos[m.names.geom["nose"]])
        head = d.xmat[m.names.body["head"]]
        return (nose_to_target @ head)[:2]

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["joints"] = d.qpos[3:]
        obs["to_target"] = self._nose_to_target(m, d)
        # per-segment [vx, vy, wz] from the velocimeter/gyro pairs appended
        # after the head's 12 sensor values (reference swimmer.py:152)
        xvel_local = d.sensordata[12:].reshape(-1, 6)
        obs["body_velocities"] = xvel_local[:, jnp.array([0, 1, 5])].ravel()
        return obs

    def reward(self, m, d):
        target_size = m.geom_size[m.names.geom["target"], 0]
        dist = jnp.linalg.norm(self._nose_to_target(m, d))
        return rewards.tolerance(dist, bounds=(0, target_size),
                                 margin=5 * target_size,
                                 sigmoid="long_tail")
