"""Lean observation path: tasks declaring ``observation_stages = "vel"``
must see IDENTICAL observations from the trimmed per-control-step
recompute (no CRB/factor/collision/RNE/sensor_acc) as from the full
pipeline — the batched analogue of observing after mj_step1 only
(reference dm_control/mujoco/engine.py:149-166).
"""

import jax
import jax.numpy as jnp
import pytest

import dm_control_tpu.suite as suite
from dm_control_tpu.physics import engine, sensors as sens


@pytest.mark.parametrize("domain,task", [("walker", "run"),
                                         ("cheetah", "run"),
                                         ("swimmer", "swimmer6")])
def test_lean_observation_matches_full(domain, task):
    env = suite.load_batch(domain, task, dtype=jnp.float32)
    assert env.task.observation_stages == "vel"
    key = jax.random.PRNGKey(3)
    state, ts = env.reset(jax.random.split(key, 3))
    acts = 0.3 * jnp.ones((3, env.model.nu), jnp.float32)
    state, ts = env.step(state, acts)  # uses the lean path internally

    # full-pipeline reference observation at the same state (the
    # per-episode model_diff — e.g. swimmer's randomized target — must
    # be applied exactly as _observe does)
    from dm_control_tpu.rl.control import apply_model_diff

    d = jax.vmap(env._unstrip)(state.data)

    def full_obs(d, diff):
        m = apply_model_diff(env.model, diff)
        d = engine.fwd_position(m, d)
        d = sens.sensor_pos(m, d)
        d = engine.fwd_velocity(m, d)
        d = sens.sensor_vel(m, d)
        d = sens.sensor_acc(m, d)
        return env.task.observation(m, d)

    ref = jax.jit(jax.vmap(full_obs))(d, state.model_diff)
    for k in ref:
        dev = float(jnp.max(jnp.abs(ref[k] - ts.observation[k])))
        assert dev < 1e-5, (k, dev)


def test_acc_stage_tasks_keep_full_pipeline():
    env = suite.load_batch("hopper", "hop", dtype=jnp.float32)
    assert env.task.observation_stages == "acc"
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(jax.random.split(key, 2))
    acts = 0.5 * jnp.ones((2, env.model.nu), jnp.float32)
    state, ts = env.step(state, acts)
    # touch observation flows from the acc stage and must stay finite
    assert bool(jnp.all(jnp.isfinite(ts.observation["touch"])))
