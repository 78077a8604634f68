"""LQR domain (reference: dm_control/suite/lqr.py).

Procedural chain of masses with position actuators; reward is a quadratic
regulator cost.  Note the model itself is *randomized at construction*
(joint stiffness drawn from the task RandomState), matching the reference's
_make_model(random).
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.lqr import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = float("inf")
_CONTROL_COST_COEF = 0.1
SUITE = containers.TaggedTasks()


def _extend(root, n_bodies, n_actuators, random,
            stiffness_range=(15, 25), damping_range=(0, 0)):
    parent = root.first("worldbody")
    actuator = root.add("actuator")
    tendon = root.add("tendon")
    for body in range(n_bodies):
        child = parent.add("body", name=f"body_{body}", pos=".25 0 0")
        joint = child.add(
            "joint", name=f"joint_{body}",
            stiffness=str(random.uniform(*stiffness_range)),
            damping=str(random.uniform(*damping_range)))
        child.add("geom", name=f"geom_{body}")
        child.add("site", name=f"site_{body}")
        if body == 0:
            child.attrib["pos"] = ".25 0 .1"
        if body < n_actuators:
            actuator.add("motor", name=f"motor_{body}",
                         joint=f"joint_{body}")
        if body < n_bodies - 1:
            spatial = tendon.add("spatial", name=f"tendon_{body}")
            spatial.add("site", site=f"site_{body}")
            spatial.add("site", site=f"site_{body + 1}")
        parent = child


def get_model(n_bodies, n_actuators, random):
    # model structure depends on the RandomState draw: no caching
    from dm_control_tpu.mjcf.compiler import compile_model
    from dm_control_tpu.suite._modelgen import to_element

    root = to_element(MODEL)
    _extend(root, n_bodies, n_actuators, random)
    return compile_model(root)


def _make_lqr(n_bodies, n_actuators, time_limit, random,
              environment_kwargs):
    if not isinstance(random, np.random.RandomState):
        random = np.random.RandomState(random)
    m = get_model(n_bodies, n_actuators, random)
    return control.Environment(
        m, LQRLevel(_CONTROL_COST_COEF), time_limit=time_limit,
        random=random, **(environment_kwargs or {}))


@SUITE.add()
def lqr_2_1(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _make_lqr(2, 1, time_limit, random, environment_kwargs)


@SUITE.add()
def lqr_6_2(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _make_lqr(6, 2, time_limit, random, environment_kwargs)


class LQRLevel(base.Task):
    """Quadratic regulator task (reference lqr.py LQRLevel)."""

    _TERMINAL_TOL = 1e-6

    def __init__(self, control_cost_coef):
        if control_cost_coef <= 0:
            raise ValueError("control_cost_coef must be positive.")
        self._control_cost_coef = control_cost_coef

    @property
    def control_cost_coef(self):
        """reference lqr.py LQRLevel.control_cost_coef (used by
        suite/lqr_solver.py)."""
        return self._control_cost_coef

    def init(self, m, qpos, qvel, rc, diff):
        unit = rc.randn(m.nq)
        if rc.is_numpy:
            qpos = np.sqrt(2) * unit / np.linalg.norm(unit)
        else:
            qpos = jnp.sqrt(2.0) * unit / jnp.linalg.norm(unit)
        return qpos, qvel, diff

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        state_cost = 0.5 * jnp.dot(d.qpos, d.qpos)
        control_cost = 0.5 * jnp.dot(d.ctrl, d.ctrl)
        return 1 - (state_cost + control_cost * self._control_cost_coef)

    def termination(self, m, d):
        norm = jnp.sqrt(jnp.dot(d.qpos, d.qpos) + jnp.dot(d.qvel, d.qvel))
        return norm < self._TERMINAL_TOL, jnp.asarray(0.0, d.qpos.dtype)
