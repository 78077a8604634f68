"""Manipulation task library
(reference: dm_control/manipulation/__init__.py:24-56).

Exposes the reference's task names (`reach_site_features`,
`lift_brick_features`, `stack_2_bricks_features`, ...).  Vision
variants construct identical physics with proprioception-only state
observables; pixel rendering plugs in via
dm_control_tpu.suite.wrappers.pixels.set_render_backend (raster is
off-path, BASELINE.md north star).
"""

from __future__ import annotations

from dm_control_tpu.manipulation import bricks  # noqa: F401
from dm_control_tpu.manipulation import lift  # noqa: F401
from dm_control_tpu.manipulation import place  # noqa: F401
from dm_control_tpu.manipulation import reach  # noqa: F401
from dm_control_tpu.manipulation.shared import registry as _registry

_registry.done_importing_tasks()

ALL = _registry.get_all_names()
TAGS = _registry.get_tags()


def load(environment_name, seed=None):
    """Builds the named manipulation environment
    (reference __init__.py:49)."""
    factory = _registry.get(environment_name)
    env = factory()
    if seed is not None:
        env._random_state.seed(seed)
    return env


def get_environments_by_tag(tag):
    """Names of environments carrying ``tag`` (reference __init__.py:56)."""
    return tuple(_registry.get_names_by_tag(tag))


def load_batch(environment_name, time_limit=10.0, dtype=None,
               autoreset=True):
    """Builds the named task on the batched TPU path: a
    ``rl.batch_env.BatchEnv`` stepping thousands of envs under one jit
    (no reference analogue — SubprocVecEnv at scripts/vec_env.py:396 is
    the process-per-env equivalent).  The task must implement the
    ``composer.batch.BatchableTask`` protocol."""
    from dm_control_tpu.composer.batch import compile_task

    factory = _registry.get(environment_name)
    env = factory()
    return compile_task(env.task, time_limit=time_limit, dtype=dtype,
                        autoreset=autoreset)
