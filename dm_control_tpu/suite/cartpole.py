"""Cartpole domain (reference: dm_control/suite/cartpole.py).

Balance / swing up one or more poles on a cart, including the procedural
multi-pole variants (reference cartpole.py:105-127 `_make_model`).
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.cartpole import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers, rewards

_DEFAULT_TIME_LIMIT = 10
SUITE = containers.TaggedTasks()


def _add_poles(root, n_poles):
    """Extends the single-pole model into an n-pole chain."""
    worldbody = root.first("worldbody")
    cart = next(b for b in worldbody.children if b.tag == "body")
    parent = next(b for b in cart.children if b.tag == "body")  # first pole
    for i in range(2, n_poles + 1):
        child = parent.add("body", name=f"pole_{i}", pos="0 0 1",
                           childclass="pole")
        child.add("joint", name=f"hinge_{i}")
        child.add("geom", name=f"pole_{i}")
        parent = child
    floor = next(g for g in worldbody.children if g.tag == "geom")
    floor.attrib["pos"] = f"0 0 {1 - n_poles - .05}"


def get_model(num_poles=1):
    if num_poles == 1:
        return compile_domain_model(MODEL)
    return compile_domain_model(
        MODEL, mutate=lambda r: _add_poles(r, num_poles),
        cache_key=num_poles)


def _env(swing_up, sparse, num_poles, time_limit, random,
         environment_kwargs):
    m = get_model(num_poles)
    task = Balance(swing_up=swing_up, sparse=sparse)
    return control.Environment(m, task, time_limit=time_limit, random=random,
                               **(environment_kwargs or {}))


@SUITE.add("benchmarking")
def balance(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _env(False, False, 1, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def balance_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
    return _env(False, True, 1, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def swingup(time_limit=_DEFAULT_TIME_LIMIT, random=None,
            environment_kwargs=None):
    return _env(True, False, 1, time_limit, random, environment_kwargs)


@SUITE.add("benchmarking")
def swingup_sparse(time_limit=_DEFAULT_TIME_LIMIT, random=None,
                   environment_kwargs=None):
    return _env(True, True, 1, time_limit, random, environment_kwargs)


@SUITE.add()
def two_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None,
              environment_kwargs=None):
    return _env(True, False, 2, time_limit, random, environment_kwargs)


@SUITE.add()
def three_poles(time_limit=_DEFAULT_TIME_LIMIT, random=None, num_poles=3,
                sparse=False, environment_kwargs=None):
    return _env(True, sparse, num_poles, time_limit, random,
                environment_kwargs)


class Balance(base.Task):
    """Keep the pole(s) upright (reference cartpole.py Balance)."""

    _CART_RANGE = (-0.25, 0.25)
    _ANGLE_COSINE_RANGE = (0.995, 1)

    def __init__(self, swing_up, sparse):
        self._swing_up = swing_up
        self._sparse = sparse

    def init(self, m, qpos, qvel, rc, diff):
        nv = m.nv
        if self._swing_up:
            qpos = self.set_joint_qpos(m, qpos, "slider", 0.01 * rc.randn())
            qpos = self.set_joint_qpos(m, qpos, "hinge_1",
                                       np.pi + 0.01 * rc.randn())
            rest = 0.1 * rc.randn(nv - 2)
            qpos = _set_range(qpos, 2, rest)
        else:
            qpos = self.set_joint_qpos(m, qpos, "slider",
                                       rc.uniform(-0.1, 0.1))
            rest = rc.uniform(-0.034, 0.034, nv - 1)
            qpos = _set_range(qpos, 1, rest)
        qvel = _set_range(qvel, 0, 0.01 * rc.randn(nv))
        return qpos, qvel, diff

    def _pole_angle_cosine(self, m, d):
        return d.xmat[2:, 2, 2]

    def observation(self, m, d):
        obs = collections.OrderedDict()
        cart_pos = self.joint_qpos(m, d, "slider")
        # (npoles, 2) of [zz, xz] per pole body, raveled
        pole = jnp.stack([d.xmat[2:, 2, 2], d.xmat[2:, 0, 2]], axis=-1)
        obs["position"] = jnp.concatenate([cart_pos[None], pole.ravel()])
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        if self._sparse:
            cart_in_bounds = rewards.tolerance(
                self.joint_qpos(m, d, "slider"), self._CART_RANGE)
            angle_in_bounds = jnp.prod(rewards.tolerance(
                self._pole_angle_cosine(m, d), self._ANGLE_COSINE_RANGE))
            return cart_in_bounds * angle_in_bounds
        upright = (self._pole_angle_cosine(m, d) + 1) / 2
        centered = rewards.tolerance(self.joint_qpos(m, d, "slider"),
                                     margin=2)
        centered = (1 + centered) / 2
        small_control = rewards.tolerance(
            d.ctrl, margin=1, value_at_margin=0, sigmoid="quadratic")[0]
        small_control = (4 + small_control) / 5
        small_velocity = jnp.min(rewards.tolerance(d.qvel[1:], margin=5))
        small_velocity = (1 + small_velocity) / 2
        return jnp.mean(upright) * small_control * small_velocity * centered


def _set_range(arr, start, values):
    if hasattr(arr, "at") and not isinstance(arr, np.ndarray):
        return arr.at[start:].set(values)
    arr = np.asarray(arr, dtype=np.float64).copy()
    arr[start:] = values
    return arr
