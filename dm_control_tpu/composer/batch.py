"""Lowering composer tasks onto the batched TPU path.

The reference steps composer environments one at a time through Python
hooks (dm_control/composer/environment.py:321-399) and parallelizes with
one OS process per env (dm_control/scripts/vec_env.py:396).  Here a
composer task that implements the ``BatchableTask`` protocol — pure-jax
mirrors of its episode-init/observation/reward hooks — is compiled ONCE
into a static Model and stepped as a vmapped pure function by
``rl.batch_env.BatchEnv``: thousands of envs per chip, shardable over a
mesh.

Per-episode randomization is expressed as data, not recompilation:
  - model overrides through the ``model_diff`` dict (e.g. a resampled
    target site position overrides ``site_pos``);
  - task-private per-env state through "_"-prefixed diff keys, surfaced
    to reward/observation as ``m.task_state`` (rl/control.apply_model_diff).
"""

from __future__ import annotations

import jax.numpy as jnp

from dm_control_tpu.mjcf.compiler import compile_model
from dm_control_tpu.rl import control
from dm_control_tpu.rl.batch_env import BatchEnv


class BatchableTask:
    """Protocol mixin for composer tasks that can run on the batched path.

    The host-side composer hooks (initialize_episode, get_reward, ...)
    remain the parity path; these pure mirrors define the same task logic
    as traceable functions of (Model, Data).
    """

    #: physics steps to settle after init (inside jit)
    batch_settle_steps: int = 0
    #: shape of batch_reward's per-env return (e.g. (n_players,) for
    #: multi-agent tasks); () means scalar reward
    batch_reward_shape: tuple = ()
    #: re-draw episodes while batch_reject holds (bounded while_loop)
    batch_max_reset_rejections: int = 0

    def batch_model_diff(self, m):
        """Structure (with defaults) of the per-episode model_diff."""
        return {}

    def batch_init(self, m, qpos, qvel, rc, diff):
        """Pure episode init: returns (qpos, qvel, diff)."""
        return qpos, qvel, diff

    def batch_reject(self, m, d):
        return jnp.asarray(False)

    def batch_observation(self, m, d):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement the batched path")

    def batch_reward(self, m, d):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement the batched path")

    def batch_termination(self, m, d):
        return jnp.asarray(False), jnp.asarray(1.0, d.qpos.dtype)


class _PureTaskAdapter(control.Task):
    """Wraps a BatchableTask composer task as an rl.control.Task."""

    def __init__(self, ctask):
        self._t = ctask
        self.settle_steps = getattr(ctask, "batch_settle_steps", 0)
        self.reward_shape = getattr(ctask, "batch_reward_shape", ())
        self.max_reset_rejections = getattr(
            ctask, "batch_max_reset_rejections", 0)

    def initial_model_diff(self, m):
        return self._t.batch_model_diff(m)

    def init(self, m, qpos, qvel, rc, diff):
        return self._t.batch_init(m, qpos, qvel, rc, diff)

    def reject(self, m, d):
        return self._t.batch_reject(m, d)

    def observation(self, m, d):
        return self._t.batch_observation(m, d)

    def reward(self, m, d):
        return self._t.batch_reward(m, d)

    def termination(self, m, d):
        return self._t.batch_termination(m, d)


def compile_task(task, time_limit=10.0, dtype=None,
                 autoreset=True) -> BatchEnv:
    """Compiles a composer task's entity tree once and returns a BatchEnv.

    ``task`` must implement the BatchableTask protocol.  The model is
    compiled from the root entity's mjcf tree exactly as the host
    composer.Environment does (environment.py _recompile_physics), so the
    two paths simulate the same physics.
    """
    if not isinstance(task, BatchableTask):
        raise TypeError(
            f"{type(task).__name__} does not implement BatchableTask")
    root = task.root_entity.mjcf_model
    opt = root.first("option")
    if opt is None:
        opt = root.add("option")
    opt.attrib["timestep"] = str(task.physics_timestep)
    model = compile_model(root, dtype=dtype)
    return BatchEnv(model, _PureTaskAdapter(task),
                    time_limit=time_limit,
                    control_timestep=task.control_timestep,
                    autoreset=autoreset, dtype=dtype)
