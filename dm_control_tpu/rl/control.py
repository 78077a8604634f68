"""Environment core: a functional, vmappable episode engine + dm_env adapter.

The reference's ``control.Environment`` (dm_control/rl/control.py:28-123)
drives one Python env instance: before_step → n_sub_steps × physics.step →
reward/obs/termination with exceptions for divergence.  Here the episode
logic is *data*: a pure ``step(state, action) -> (state, TimeStepData)``
function batched with ``jax.vmap``, where auto-reset and divergence are
per-env flags rather than control flow.  A thin adapter exposes the
classic dm_env interface for single-env use and parity testing.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Dict, Optional

import dm_env
from dm_env import specs
import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import engine
from dm_control_tpu.physics.model import Data, Model, make_data, pytree_dataclass, static_field

FIRST = int(dm_env.StepType.FIRST)
MID = int(dm_env.StepType.MID)
LAST = int(dm_env.StepType.LAST)

_DEFAULT_TIME_LIMIT = float("inf")


@pytree_dataclass
class EnvState:
    """Per-environment episode state (a pure pytree)."""

    data: Data
    model_diff: Any  # dict of Model field overrides (possibly empty)
    rng: jax.Array  # PRNG key for jax-path episode inits
    step_count: jax.Array  # int32
    needs_reset: jax.Array  # bool: next call must start a new episode


@pytree_dataclass
class TimeStepData:
    """Batched dm_env.TimeStep payload."""

    step_type: jax.Array  # int32: FIRST/MID/LAST
    reward: jax.Array
    discount: jax.Array
    observation: Any  # OrderedDict[str, Array]


class RandomContext:
    """Uniform front-end over numpy RandomState and jax PRNG keys.

    Task ``init`` procedures call this for every random draw; with a
    ``numpy.random.RandomState`` backend the *call sequence* matches the
    reference exactly (bit-identical episode initialization under the same
    seed, cf. dm_control/suite/base.py:48), while the jax backend makes the
    same logical draws traceable inside jit.
    """

    def __init__(self, np_random: Optional[np.random.RandomState] = None,
                 key: Optional[jax.Array] = None):
        if (np_random is None) == (key is None):
            raise ValueError("Provide exactly one of np_random or key.")
        self._np = np_random
        self._key = key

    @property
    def is_numpy(self) -> bool:
        return self._np is not None

    def _next(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def uniform(self, low=0.0, high=1.0, size=None):
        if self._np is not None:
            return self._np.uniform(low, high, size)
        shape = () if size is None else ((size,) if isinstance(size, int) else tuple(size))
        low = jnp.asarray(low)
        high = jnp.asarray(high)
        shape = jnp.broadcast_shapes(shape, low.shape, high.shape)
        return jax.random.uniform(self._next(), shape,
                                  minval=low, maxval=high)

    def randn(self, *size):
        if self._np is not None:
            return self._np.randn(*size)
        return jax.random.normal(self._next(), size)

    def rand(self, *size):
        if self._np is not None:
            return self._np.rand(*size)
        return jax.random.uniform(self._next(), size)


class Task:
    """Functional task interface (replaces dm_control/rl/control.py:268 Task +
    dm_control/suite/base.py:24).

    Subclasses implement pure functions over (Model, Data); randomness goes
    through ``RandomContext`` so one ``init`` body serves both the
    numpy-parity path and the jit path.
    """

    #: extra physics steps after init to settle state (cheetah does 200,
    #: reference dm_control/suite/cheetah.py)
    settle_steps: int = 0
    #: if true, re-draw the initial state while `reject(m, d)` holds
    #: (ball_in_cup's penetration rejection loop)
    max_reset_rejections: int = 0
    #: shape of the per-step reward; multi-agent tasks (soccer) return a
    #: per-player vector, so reset timesteps must match that shape
    reward_shape: tuple = ()

    def init(self, m: Model, qpos, qvel, rc: RandomContext, diff: Dict):
        """Returns (qpos, qvel, diff) for a new episode."""
        return qpos, qvel, diff

    def init_act(self, m: Model, rc: RandomContext):
        """Optional actuator-activation init drawn AFTER ``init`` on the same
        RandomState stream (dog randomizes ``act``, reference
        dm_control/suite/dog.py:292-296).  Returns an (na,) array or None."""
        return None

    def reject(self, m: Model, d: Data):
        return jnp.asarray(False)

    def reject_reinit(self, m: Model, qpos, qvel, rc: RandomContext,
                      diff: Dict):
        """Re-draw after a rejected initial state.  Defaults to a full
        ``init``; override when the reference's rejection loop re-draws
        only part of the state (e.g. finger re-randomizes joints only)."""
        return self.init(m, qpos, qvel, rc, diff)

    def initial_model_diff(self, m: Model) -> Dict:
        """Structure (with defaults) of per-episode model overrides."""
        return {}

    def observation(self, m: Model, d: Data):
        raise NotImplementedError

    def reward(self, m: Model, d: Data):
        raise NotImplementedError

    def termination(self, m: Model, d: Data):
        """Returns (terminate: bool, discount_on_termination)."""
        return jnp.asarray(False), jnp.asarray(1.0, d.qpos.dtype)

    def before_step(self, m: Model, d: Data, action) -> Data:
        return d.replace(ctrl=jnp.asarray(action, d.ctrl.dtype))


def apply_model_diff(m: Model, diff: Dict) -> Model:
    """Applies per-episode Model field overrides.  Keys starting with "_"
    are task-private per-env state (not Model fields); they are gathered
    into ``m.task_state`` for task observation/reward functions."""
    if not diff:
        return m
    pub = {k: v for k, v in diff.items() if not k.startswith("_")}
    priv = {k: v for k, v in diff.items() if k.startswith("_")}
    if priv:
        pub["task_state"] = priv
    return m.replace(**pub) if pub else m


class Environment(dm_env.Environment):
    """Single-env dm_env adapter over the functional core.

    API-compatible with the reference ``control.Environment``
    (dm_control/rl/control.py:28): reset/step/action_spec/observation_spec,
    numpy in/out, host-side np.random.RandomState episode init for
    bit-parity with the reference under a fixed seed.
    """

    def __init__(self, model: Model, task: Task,
                 time_limit: float = _DEFAULT_TIME_LIMIT,
                 control_timestep: Optional[float] = None,
                 random=None):
        self._model = model
        self._task = task
        if not isinstance(random, np.random.RandomState):
            random = np.random.RandomState(random)
        self._random = random
        self._physics_timestep = float(np.asarray(model.opt.timestep))
        if control_timestep is None:
            control_timestep = self._physics_timestep
        self._control_timestep = control_timestep
        # float32-compiled models round timesteps; widen the divisibility
        # tolerance accordingly (f64 keeps the reference's strict 1e-8)
        tol = 1e-8 if model.qpos0.dtype == jnp.float64 else 1e-4
        self._n_sub_steps = compute_n_steps(control_timestep,
                                            self._physics_timestep,
                                            tolerance=tol)
        self._time_limit = time_limit
        if time_limit == float("inf"):
            self._step_limit = float("inf")
        else:
            self._step_limit = int(round(time_limit / control_timestep))
        self._step_count = 0
        self._state: Optional[EnvState] = None
        self._reset_next_step = True

        m0 = model

        def _substeps(mm, d):
            if self._n_sub_steps > 1:
                d = jax.lax.fori_loop(0, self._n_sub_steps,
                                      lambda i, dd: engine.step(mm, dd), d)
            else:
                d = engine.step(mm, d)
            # refresh position/velocity stage for observations (the
            # mj_step2 + mj_step1 split, dm_control/mujoco/engine.py:154-166)
            d = engine.fwd_position(mm, d)
            from dm_control_tpu.physics import sensors as sens

            d = sens.sensor_pos(mm, d)
            d = engine.fwd_velocity(mm, d)
            d = sens.sensor_vel(mm, d)
            # NOTE: acceleration-stage sensors (force/torque/accelerometer/
            # touch) are deliberately NOT refreshed: the reference's
            # mj_step2 ... mj_step1 split (engine.py:149-166) leaves them
            # at the values computed inside the last substep's forward.
            return d

        def _step_fn(data: Data, diff, action):
            mm = apply_model_diff(m0, diff)
            d = task.before_step(mm, data, action)
            d = _substeps(mm, d)
            reward = task.reward(mm, d)
            obs = task.observation(mm, d)
            return d, reward, obs

        def _obs_fn(data: Data, diff):
            mm = apply_model_diff(m0, diff)
            d = _substeps_obs_only(mm, data)
            return d, task.observation(mm, d)

        def _substeps_obs_only(mm, d):
            d = engine.fwd_position(mm, d)
            from dm_control_tpu.physics import sensors as sens

            d = sens.sensor_pos(mm, d)
            d = engine.fwd_velocity(mm, d)
            d = sens.sensor_vel(mm, d)
            # the reference's post-reset forward runs with actuation
            # DISABLED (dm_control/mujoco/engine.py ``after_reset``), so the
            # reset-timestep observation must not see actuator forces even
            # when ``act`` is nonzero (e.g. dog randomizes activations)
            d = d.replace(
                qfrc_actuator=jnp.zeros_like(d.qfrc_actuator),
                actuator_force=jnp.zeros_like(d.actuator_force))
            d = engine.fwd_acceleration(mm, d)
            d = engine.fwd_constraint(mm, d)
            d = sens.sensor_acc(mm, d)
            return d

        def _settle_fn(data: Data, diff):
            mm = apply_model_diff(m0, diff)
            from dm_control_tpu.physics.model import IntegratorType

            # The reference's settle loop runs INSIDE reset_context
            # (e.g. cheetah initialize_episode, suite/cheetah.py:71-73), so
            # its first physics.step() is mj_step2-first (engine.py:154-166)
            # over position/velocity-stage fields computed at qpos0 by
            # reset()'s forward — the randomized qpos only enters through
            # the integrator.  Replicate: forward a pristine state, graft
            # the randomized qpos/qvel in, integrate, then step normally.
            first = data
            rest = task.settle_steps
            if rest and mm.opt.integrator != int(IntegratorType.RK4):
                d0 = engine.forward(mm, make_data(mm, data.qpos.dtype))
                d1 = d0.replace(qpos=data.qpos, qvel=data.qvel,
                                act=data.act, ctrl=data.ctrl,
                                qacc_warmstart=d0.qacc)
                first = engine.euler(mm, d1)
                rest -= 1
            d = jax.lax.fori_loop(0, rest,
                                  lambda i, dd: engine.step(mm, dd), first)
            d = d.replace(time=jnp.zeros_like(d.time))
            return d

        self._jit_step = jax.jit(_step_fn)
        self._jit_obs = jax.jit(_obs_fn)
        self._jit_settle = jax.jit(_settle_fn) if task.settle_steps else None
        self._jit_reject = jax.jit(
            lambda data, diff: task.reject(apply_model_diff(m0, diff), data))

    # -- dm_env API ---------------------------------------------------------

    @property
    def physics(self):
        return _PhysicsView(self._model, self._state)

    @property
    def task(self):
        return self._task

    @property
    def random_state(self) -> np.random.RandomState:
        """The episode-initialization RandomState (reference keeps this on
        the task, dm_control/suite/base.py:48)."""
        return self._random

    def control_timestep(self) -> float:
        return self._control_timestep

    def reset(self) -> dm_env.TimeStep:
        self._step_count = 0
        self._reset_next_step = False
        m = self._model
        rc = RandomContext(np_random=self._random)
        diff = self._task.initial_model_diff(m)
        attempts = max(1, self._task.max_reset_rejections)
        init_fn = self._task.init
        for _ in range(attempts):
            d = make_data(m)
            qpos, qvel, diff = init_fn(
                m, np.asarray(m.qpos0).copy(),
                np.zeros(m.nv), rc, diff)
            init_fn = self._task.reject_reinit
            d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                          qvel=jnp.asarray(qvel, d.qvel.dtype))
            act0 = self._task.init_act(m, rc)
            if act0 is not None:
                d = d.replace(act=jnp.asarray(act0, d.act.dtype))
            if self._task.settle_steps:
                d = self._jit_settle(d, diff)
            if self._task.max_reset_rejections:
                if not bool(self._jit_reject(d, diff)):
                    break
            else:
                break
        d, obs = self._jit_obs(d, diff)
        self._state = EnvState(
            data=d, model_diff=diff, rng=jax.random.PRNGKey(0),
            step_count=jnp.asarray(0, jnp.int32),
            needs_reset=jnp.asarray(False))
        return dm_env.TimeStep(dm_env.StepType.FIRST, None, None,
                               _to_numpy_obs(obs))

    def step(self, action) -> dm_env.TimeStep:
        if self._reset_next_step or self._state is None:
            return self.reset()
        d, reward, obs = self._jit_step(
            self._state.data, self._state.model_diff, action)
        self._state = self._state.replace(data=d)
        self._step_count += 1
        reward = float(reward)
        terminate, discount = self._task.termination(
            apply_model_diff(self._model, self._state.model_diff), d)
        obs = _to_numpy_obs(obs)
        if bool(terminate):
            self._reset_next_step = True
            return dm_env.TimeStep(dm_env.StepType.LAST, reward,
                                   float(discount), obs)
        if self._step_count >= self._step_limit:
            self._reset_next_step = True
            return dm_env.TimeStep(dm_env.StepType.LAST, reward, 1.0, obs)
        return dm_env.TimeStep(dm_env.StepType.MID, reward, 1.0, obs)

    def action_spec(self):
        return action_spec(self._model)

    def observation_spec(self):
        if self._state is not None:
            data, diff = self._state.data, self._state.model_diff
        else:
            # a throwaway episode init with an INDEPENDENT RandomState: the
            # reference's spec query consumes no task RNG
            # (dm_control/rl/control.py:202-267), so peeking at the spec
            # must not perturb the seeded episode stream
            m = self._model
            rc = RandomContext(np_random=np.random.RandomState(0))
            diff = self._task.initial_model_diff(m)
            d = make_data(m)
            qpos, qvel, diff = self._task.init(
                m, np.asarray(m.qpos0).copy(), np.zeros(m.nv), rc, diff)
            data = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype),
                             qvel=jnp.asarray(qvel, d.qvel.dtype))
            act0 = self._task.init_act(m, rc)
            if act0 is not None:
                data = data.replace(act=jnp.asarray(act0, data.act.dtype))
        _, obs = self._jit_obs(data, diff)
        out = collections.OrderedDict()
        for k, v in obs.items():
            v = np.asarray(v)
            out[k] = specs.Array(shape=v.shape, dtype=v.dtype, name=k)
        return out


class _PhysicsView:
    """Read access to the current state (subset of engine.Physics API)."""

    def __init__(self, model, state):
        self.model = model
        self._state = state

    @property
    def data(self):
        return self._state.data

    def time(self):
        return float(self._state.data.time)

    def render(self, height=240, width=320, camera_id=-1, overlays=(),
               depth=False, segmentation=False, scene_option=None,
               render_flag_overrides=None, scene_callback=None):
        """Ray-cast render of the current state (engine.py:168-217)."""
        from dm_control_tpu import rendering
        return rendering.render(self, height=height, width=width,
                                camera_id=camera_id, depth=depth,
                                segmentation=segmentation)


def compute_n_steps(control_timestep, physics_timestep, tolerance=1e-8):
    """Validated substep count (dm_control/rl/control.py:164-190)."""
    if control_timestep < physics_timestep:
        raise ValueError(
            f"Control timestep ({control_timestep}) cannot be smaller than "
            f"physics timestep ({physics_timestep}).")
    if abs((control_timestep / physics_timestep)
           - round(control_timestep / physics_timestep)) > tolerance:
        raise ValueError(
            "Control timestep must be an integer multiple of physics "
            "timestep.")
    return int(round(control_timestep / physics_timestep))


def action_spec(model: Model):
    """BoundedArray from actuator ctrlrange (dm_control/mujoco/engine.py:1018)."""
    nu = model.nu
    minima = np.full(nu, -np.inf)
    maxima = np.full(nu, np.inf)
    limited = np.asarray(model.actuator_ctrllimited, bool)
    ctrlrange = np.asarray(model.actuator_ctrlrange)
    minima[limited] = ctrlrange[limited, 0]
    maxima[limited] = ctrlrange[limited, 1]
    return specs.BoundedArray(
        shape=(nu,), dtype=np.float64, minimum=minima, maximum=maxima,
        name="\t".join(_actuator_names(model)))


def _actuator_names(model: Model):
    names = [None] * model.nu
    for name, i in model.names.actuator.items():
        names[i] = name
    return [n or "" for n in names]


def _to_numpy_obs(obs):
    out = collections.OrderedDict()
    for k, v in obs.items():
        out[k] = np.asarray(v)
    return out


def flatten_observation(observation, output_key="observations"):
    """Flattens dict observations into a single vector
    (dm_control/rl/control.py:368)."""
    if not isinstance(observation, collections.abc.MutableMapping):
        raise ValueError("Can only flatten dict-like observations.")
    keys = list(observation.keys())
    observation_arrays = [np.asarray(observation[k]).ravel() for k in keys]
    return type(observation)(
        [(output_key, np.concatenate(observation_arrays))])
