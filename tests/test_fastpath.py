"""Fused scalar-chain fast path parity tests (physics/fastpath.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dm_control_tpu.suite as suite
from dm_control_tpu.physics import engine, fastpath
from dm_control_tpu.physics.model import make_data


def _load(dom, task):
    return suite.load_batch(dom, task, dtype=jnp.float64)


def test_applicability_matrix():
    assert fastpath.build_step(_load("pendulum", "swingup").model)
    assert fastpath.build_step(_load("cartpole", "swingup").model)
    assert fastpath.build_step(_load("reacher", "easy").model)
    # acrobot's static contact rows are supported since the fast path
    # learned fixed contact-row layouts; point_mass still falls back
    # because of its tendon coupling
    assert fastpath.build_step(_load("acrobot", "swingup").model)
    assert fastpath.build_step(_load("point_mass", "easy").model) is None


@pytest.mark.parametrize("dom,task", [("pendulum", "swingup"),
                                      ("cartpole", "swingup"),
                                      ("cartpole", "two_poles"),
                                      ("reacher", "easy"),
                                      ("acrobot", "swingup")])
def test_trajectory_matches_general_engine(dom, task):
    env = _load(dom, task)
    m = env.model
    step1 = jax.jit(fastpath.build_step(m))
    gstep = jax.jit(lambda d: engine.step(m, d))
    rng = np.random.RandomState(0)
    d = make_data(m, jnp.float64)
    qpos = jnp.asarray(np.asarray(m.qpos0) + rng.randn(m.nq) * 0.3)
    qvel = jnp.asarray(rng.randn(m.nv) * 0.5)
    ctrl = jnp.asarray(rng.uniform(-1, 1, m.nu))
    dg = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
    qp, qv, warm = qpos, qvel, jnp.zeros(m.nv)
    for _ in range(40):
        dg = gstep(dg)
        dg = dg.replace(qacc_warmstart=dg.qacc)
        qp, qv, warm = step1(qp, qv, warm, ctrl)
        np.testing.assert_allclose(np.asarray(qp), np.asarray(dg.qpos),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(qv), np.asarray(dg.qvel),
                                   atol=1e-10)


def test_limit_constraint_active_matches():
    """Drive the cart into its slider limit — the Newton solve with an
    active unilateral row must match the general solver."""
    env = _load("cartpole", "swingup")
    m = env.model
    step1 = jax.jit(fastpath.build_step(m))
    gstep = jax.jit(lambda d: engine.step(m, d))
    d = make_data(m, jnp.float64)
    ctrl = jnp.asarray([1.0])  # push hard toward the rail end
    dg = d.replace(ctrl=ctrl)
    qp, qv, warm = dg.qpos, dg.qvel, jnp.zeros(m.nv)
    hit_limit = False
    lo, hi = np.asarray(m.jnt_range)[0]
    for _ in range(400):
        dg = gstep(dg)
        dg = dg.replace(qacc_warmstart=dg.qacc)
        qp, qv, warm = step1(qp, qv, warm, ctrl)
        if float(qp[0]) > hi - 1e-3:
            hit_limit = True
        np.testing.assert_allclose(np.asarray(qp), np.asarray(dg.qpos),
                                   atol=1e-9)
    assert hit_limit, "test never reached the joint limit"


def test_batch_env_uses_fastpath_and_matches():
    env = _load("cartpole", "swingup")
    assert env._fast_step1 is not None
    env2 = _load("cartpole", "swingup")
    env2._fast_step1 = None
    env2.reset = jax.jit(jax.vmap(env2._reset_one))
    env2.step = jax.jit(jax.vmap(env2._step_one))
    rngs = jax.random.split(jax.random.PRNGKey(0), 4)
    s1, t1 = env.reset(rngs)
    s2, t2 = env2.reset(rngs)
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = jnp.asarray(rng.uniform(-1, 1, (4, env.model.nu)))
        s1, t1 = env.step(s1, a)
        s2, t2 = env2.step(s2, a)
        for k in t1.observation:
            np.testing.assert_allclose(
                np.asarray(t1.observation[k]),
                np.asarray(t2.observation[k]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t1.reward),
                                   np.asarray(t2.reward), atol=1e-12)


def test_reacher_fastpath_with_model_diff_target():
    """Reacher's per-episode randomized target goes through a model_diff
    on geom_pos — a DIFF_SAFE field threaded into the fused observation
    FK as a traced input, so the fast path stays on and observations
    (which depend on the moved target geom) still match."""
    env = _load("reacher", "easy")
    assert env._fast_step1 is not None
    env2 = _load("reacher", "easy")
    env2._fast_step1 = None
    env2.reset = jax.jit(jax.vmap(env2._reset_one))
    env2.step = jax.jit(jax.vmap(env2._step_one))
    rngs = jax.random.split(jax.random.PRNGKey(2), 4)
    s1, t1 = env.reset(rngs)
    s2, t2 = env2.reset(rngs)
    rng = np.random.RandomState(2)
    for _ in range(15):
        a = jnp.asarray(rng.uniform(-1, 1, (4, 2)))
        s1, t1 = env.step(s1, a)
        s2, t2 = env2.step(s2, a)
        for k in t1.observation:
            np.testing.assert_allclose(
                np.asarray(t1.observation[k]),
                np.asarray(t2.observation[k]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(t1.reward),
                                   np.asarray(t2.reward), atol=1e-12)


def test_dynamics_affecting_model_diff_disables_fastpath():
    """A task whose model_diff touches dynamics fields must fall back."""
    from dm_control_tpu.rl.batch_env import BatchEnv

    env = _load("cartpole", "swingup")

    class DiffTask(type(env.task)):
        def initial_model_diff(self, m):
            return {"dof_damping": m.dof_damping}

    benv = BatchEnv(env.model, DiffTask.__new__(DiffTask))
    assert benv._fast_step1 is None
