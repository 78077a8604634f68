"""The control suite: benchmark task library.

API mirrors the reference (dm_control/suite/__init__.py:79-148): ``load``,
``build_environment``, and the ``ALL_TASKS``/``BENCHMARKING``/... task-set
constants, backed by the TPU-native physics engine.
"""

from __future__ import annotations

import collections
import inspect
import itertools

from dm_control_tpu.rl import control  # noqa: F401
from dm_control_tpu.suite import acrobot
from dm_control_tpu.suite import ball_in_cup
from dm_control_tpu.suite import cartpole
from dm_control_tpu.suite import cheetah
from dm_control_tpu.suite import dog
from dm_control_tpu.suite import finger
from dm_control_tpu.suite import fish
from dm_control_tpu.suite import hopper
from dm_control_tpu.suite import humanoid
from dm_control_tpu.suite import humanoid_CMU
from dm_control_tpu.suite import lqr
from dm_control_tpu.suite import manipulator
from dm_control_tpu.suite import pendulum
from dm_control_tpu.suite import point_mass
from dm_control_tpu.suite import quadruped
from dm_control_tpu.suite import reacher
from dm_control_tpu.suite import stacker
from dm_control_tpu.suite import swimmer
from dm_control_tpu.suite import walker

_DOMAINS = {name: module for name, module in locals().items()
            if inspect.ismodule(module) and hasattr(module, "SUITE")}


def _get_tasks(tag):
    result = []
    for domain_name in sorted(_DOMAINS.keys()):
        domain = _DOMAINS[domain_name]
        if tag is None:
            tasks_in_domain = domain.SUITE
        else:
            tasks_in_domain = domain.SUITE.tagged(tag)
        for task_name in tasks_in_domain:
            result.append((domain_name, task_name))
    return tuple(result)


def _get_tasks_by_domain(tasks):
    result = collections.defaultdict(list)
    for domain_name, task_name in tasks:
        result[domain_name].append(task_name)
    return {k: tuple(v) for k, v in result.items()}


ALL_TASKS = _get_tasks(tag=None)
BENCHMARKING = _get_tasks("benchmarking")
EASY = _get_tasks("easy")
HARD = tuple(t for t in BENCHMARKING if t not in EASY)
EXTRA = tuple(t for t in ALL_TASKS if t not in BENCHMARKING)

TASKS_BY_DOMAIN = _get_tasks_by_domain(ALL_TASKS)
BENCHMARKING_BY_DOMAIN = _get_tasks_by_domain(BENCHMARKING)


def load(domain_name, task_name, task_kwargs=None, environment_kwargs=None,
         visualize_reward=False):
    """Returns an environment from a domain name, task name
    (reference suite/__init__.py:93)."""
    del visualize_reward  # rendering is off-path in this framework
    return build_environment(domain_name, task_name, task_kwargs,
                             environment_kwargs)


def load_batch(domain_name, task_name, task_kwargs=None, autoreset=True,
               dtype=None, contact_cap=None):
    """Returns a ``BatchEnv`` (vmapped, jit-compiled, shardable) for a
    suite task — the TPU-native replacement for wrapping ``load`` results
    in SubprocVecEnv (reference scripts/vec_env.py)."""
    from dm_control_tpu.rl.batch_env import BatchEnv

    env = build_environment(domain_name, task_name, task_kwargs)
    return BatchEnv(env._model, env._task,
                    time_limit=env._time_limit,
                    control_timestep=env._control_timestep,
                    autoreset=autoreset, dtype=dtype,
                    contact_cap=contact_cap)


def build_environment(domain_name, task_name, task_kwargs=None,
                      environment_kwargs=None):
    """Returns an environment from the suite given domain and task names."""
    if domain_name not in _DOMAINS:
        raise ValueError(f"Domain {domain_name!r} does not exist.")
    domain = _DOMAINS[domain_name]
    if task_name not in domain.SUITE:
        raise ValueError(
            f"Level {task_name!r} does not exist in domain {domain_name!r}.")
    task_kwargs = dict(task_kwargs or {})
    if environment_kwargs is not None:
        task_kwargs = dict(task_kwargs, environment_kwargs=environment_kwargs)
    return domain.SUITE[task_name](**task_kwargs)
