"""Host-composer vs batched-path consistency gate (VERDICT r2 item 3).

Every BatchableTask carries two implementations of its episode logic:
the host composer hooks (initialize_episode / get_reward / ...) and the
pure ``batch_*`` mirrors that train on the batched path.  These tests
drive BOTH paths to the SAME physics state and assert rewards,
terminations, and shared observation keys agree to fp tolerance — the
red light if either path drifts.

Reference semantics: dm_control/composer/environment.py:321-399 (the
host hook pipeline the mirrors must reproduce).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu.composer.batch import _PureTaskAdapter, compile_task
from dm_control_tpu.physics import engine
from dm_control_tpu.rl.control import apply_model_diff


def _batch_eval(benv, state, env_idx=0):
    """Evaluates the batched task's obs/reward/termination at one env's
    state (full forward so derived fields are live)."""
    task = benv.task
    m0 = benv.model

    def one(data, diff):
        m = apply_model_diff(m0, diff)
        d = engine.forward(m, benv._unstrip(data))
        return (task.observation(m, d), task.reward(m, d),
                task.termination(m, d))

    data1 = jax.tree.map(lambda x: x[env_idx], state.data)
    diff1 = jax.tree.map(lambda x: x[env_idx], state.model_diff)
    obs, reward, (term, disc) = jax.jit(one)(data1, diff1)
    return (jax.tree.map(np.asarray, obs), np.asarray(reward),
            bool(term), float(disc))


def _set_host_state(host_env, qpos, qvel):
    physics = host_env.physics
    physics._data = physics.data.replace(
        qpos=jnp.asarray(qpos, physics.data.qpos.dtype),
        qvel=jnp.asarray(qvel, physics.data.qvel.dtype))
    physics.mark_as_dirty()
    physics.forward()
    return physics


def _make_manipulation(name):
    if name == "reach":
        from dm_control_tpu.manipulation.reach import Reach
        from dm_control_tpu.manipulation.shared import observations

        return Reach(use_site=True,
                     obs_settings=observations.PERFECT_FEATURES)
    from dm_control_tpu.manipulation.lift import (
        Lift, _DuploWithVertexSites,
    )
    from dm_control_tpu.manipulation.shared import observations

    return Lift(_DuploWithVertexSites(name="brick"),
                obs_settings=observations.PERFECT_FEATURES)


@pytest.mark.parametrize("name", ["reach", "lift"])
def test_manipulation_host_batch_parity(name):
    from dm_control_tpu import composer

    task = _make_manipulation(name)
    host = composer.Environment(task, time_limit=10.0)
    host.reset()
    benv = compile_task(task, time_limit=10.0)

    # batched episode init for 2 envs; compare env 0 against the host
    # driven to the identical state
    state, ts = benv.reset(jax.random.split(jax.random.PRNGKey(3), 2))
    obs_b, reward_b, term_b, disc_b = _batch_eval(benv, state)

    qpos = np.asarray(state.data.qpos[0])
    qvel = np.asarray(state.data.qvel[0])
    physics = _set_host_state(host, qpos, qvel)

    # sync per-episode host-side attributes from the batched episode data
    if name == "reach":
        tid = benv.model.names.site["target"]
        task._target_pos = np.asarray(state.model_diff["site_pos"][0, tid])
    else:
        task._target_height = float(
            state.model_diff["_target_height"][0])
        task._init_height = task._target_height - 0.3

    reward_h = float(task.get_reward(physics))
    term_h = bool(task.should_terminate_episode(physics))
    np.testing.assert_allclose(float(reward_b), reward_h, atol=1e-5,
                               err_msg=f"{name}: host/batch reward differ")
    assert term_b == term_h

    # the batched obs mirror must agree with the host-side quantities
    if name == "reach":
        np.testing.assert_allclose(
            obs_b["target_position"], task._target_position(physics),
            atol=1e-5)
        np.testing.assert_allclose(
            obs_b["pinch_position"], task._pinch_position(physics),
            atol=1e-5)
    else:
        np.testing.assert_allclose(
            obs_b["prop_position"], task._prop.position(physics),
            atol=1e-5)
        np.testing.assert_allclose(
            float(obs_b["target_height"][0]), task._target_height,
            atol=1e-5)

    # ...and keep agreeing after stepping the batched env
    acts = jnp.zeros((2, benv.model.nu), state.data.qpos.dtype)
    for _ in range(3):
        state, ts = benv.step(state, acts)
    obs_b, reward_b, term_b, _ = _batch_eval(benv, state)
    physics = _set_host_state(host, np.asarray(state.data.qpos[0]),
                              np.asarray(state.data.qvel[0]))
    np.testing.assert_allclose(float(reward_b),
                               float(task.get_reward(physics)), atol=1e-5)


@pytest.mark.slow
def test_soccer_host_batch_parity():
    from dm_control_tpu.locomotion import soccer

    # identical fixed-size pitch on both paths (the host default is a
    # per-episode RandomizedPitch, which would put the goals elsewhere)
    host = soccer.load(team_size=1, time_limit=10.0, pitch_size=(12, 9),
                       enable_field_box=True)
    task = host.task
    host.reset()
    benv = soccer.load_batch(team_size=1)

    state, ts = benv.reset(jax.random.split(jax.random.PRNGKey(0), 2))
    obs_b, reward_b, term_b, disc_b = _batch_eval(benv, state)

    physics = _set_host_state(host, np.asarray(state.data.qpos[0]),
                              np.asarray(state.data.qvel[0]))
    # refresh the host goal detectors at this state
    if hasattr(task.arena, "update_detection"):
        task.arena.update_detection(physics)
    reward_h = np.asarray([float(r) for r in task.get_reward(physics)])
    np.testing.assert_allclose(np.asarray(reward_b), reward_h, atol=1e-5)
    assert term_b == bool(task.should_terminate_episode(physics))

    # force the ball into the home goal and re-compare the scored branch
    lay = task._batch_layout(benv.model)
    goal = task.arena._home_goal
    mid = np.asarray(goal.mid, float)
    qpos = np.asarray(state.data.qpos[0]).copy()
    a = lay["ball_qadr"]
    qpos[a:a + 3] = mid
    state2 = state.replace(data=state.data.replace(
        qpos=state.data.qpos.at[0].set(jnp.asarray(
            qpos, state.data.qpos.dtype))))
    obs_b, reward_b, term_b, disc_b = _batch_eval(benv, state2)
    physics = _set_host_state(host, qpos, np.asarray(state.data.qvel[0]))
    if hasattr(task.arena, "update_detection"):
        task.arena.update_detection(physics)
    reward_h = np.asarray([float(r) for r in task.get_reward(physics)])
    np.testing.assert_allclose(np.asarray(reward_b), reward_h, atol=1e-5)
    assert term_b == bool(task.should_terminate_episode(physics))
    assert disc_b == float(task.get_discount(physics))
