"""Suite-wide contract tests (reference: dm_control/suite/suite_test.py).

Parameterized over one task per domain: action spec conformance,
observation/spec agreement, determinism under a fixed seed, registry
structure.  All domains run by default; deselect the heavyweight compiles
with ``-m "not slow"`` for a quick pass.
"""

import numpy as np
import pytest

import dm_control_tpu.suite as suite

FAST_TASKS = [
    ("pendulum", "swingup"),
    ("cartpole", "two_poles"),
    ("acrobot", "swingup_sparse"),
    ("point_mass", "hard"),
    ("reacher", "hard"),
    ("ball_in_cup", "catch"),
    ("hopper", "hop"),
    ("finger", "spin"),
    ("lqr", "lqr_2_1"),
]
SLOW_TASKS = [
    ("cheetah", "run"),
    ("walker", "run"),
    ("swimmer", "swimmer6"),
    ("fish", "swim"),
    ("humanoid", "walk"),
    ("quadruped", "walk"),
    ("manipulator", "bring_ball"),
    ("stacker", "stack_2"),
    ("humanoid_CMU", "stand"),
    ("dog", "stand"),
]

TASKS = (
    [pytest.param(d, t, id=f"{d}:{t}") for d, t in FAST_TASKS]
    + [pytest.param(d, t, id=f"{d}:{t}", marks=pytest.mark.slow)
       for d, t in SLOW_TASKS])


@pytest.mark.parametrize("domain,task", TASKS)
def test_task_contract(domain, task):
    env = suite.load(domain, task, task_kwargs={"random": 99})
    assert (domain, task) in suite.ALL_TASKS
    spec = env.action_spec()
    assert spec.shape == (env._model.nu,)
    ts = env.reset()
    assert ts.first()
    obs_spec = env.observation_spec()
    for k, v in ts.observation.items():
        assert obs_spec[k].shape == np.asarray(v).shape, k
    action = np.random.RandomState(0).uniform(
        np.maximum(spec.minimum, -1), np.minimum(spec.maximum, 1))
    for _ in range(3):
        ts = env.step(action)
        assert ts.reward is None or np.isfinite(ts.reward)
        for k, v in ts.observation.items():
            assert np.all(np.isfinite(np.asarray(v))), k


# full behavioral contract over EVERY registered task (reference
# suite_test.py:149-288 parameterizes over ALL_TASKS; the quick tier
# keeps the per-domain sample above)
_ALL = [pytest.param(d, t, id=f"{d}:{t}", marks=pytest.mark.slow)
        for d, t in suite.ALL_TASKS]

# random uniform actions don't reliably trigger these sensors
# (reference suite_test.py:262-265; finger's touch additionally needs
# more than this test's 30-step horizon — the reference runs 2x1000
# steps — to hit the spinner)
_CONSTANT_OBS_EXEMPT = {
    ("manipulator", "touch"), ("stacker", "touch"),
    ("quadruped", "force_torque"), ("finger", "touch"),
}


@pytest.mark.parametrize("domain,task", _ALL)
def test_full_task_contract(domain, task):
    """Spec conformance + same-seed determinism + no-constant-obs +
    randomized initial state, for every task in the registry."""
    n_steps = 30

    def rollout(seed):
        env = suite.load(domain, task, task_kwargs={"random": seed})
        spec = env.action_spec()
        rng = np.random.RandomState(1)
        steps = [env.reset()]
        for _ in range(n_steps):
            a = rng.uniform(np.maximum(spec.minimum, -1),
                            np.minimum(spec.maximum, 1)).astype(spec.dtype)
            steps.append(env.step(a))
        return env, steps

    env, steps = rollout(42)
    obs_spec = env.observation_spec()
    for ts in steps:
        # rewards.tolerance-based tasks live in [0,1]; lqr's quadratic
        # `1 - cost` reward is unbounded below (reference lqr.py:252-258)
        if ts.reward is not None:
            assert np.isfinite(ts.reward)
            if domain != "lqr":
                assert 0.0 <= ts.reward <= 1.0
        assert ts.discount is None or 0.0 <= ts.discount <= 1.0
        assert set(ts.observation) == set(obs_spec)
        for k, v in ts.observation.items():
            arr = np.asarray(v)
            assert arr.shape == obs_spec[k].shape, k
            assert np.all(np.isfinite(arr)), k

    # same-seed determinism: identical observation trajectories
    _, steps2 = rollout(42)
    for ts1, ts2 in zip(steps[1:], steps2[1:]):
        assert ts1.reward == ts2.reward
        for k in ts1.observation:
            np.testing.assert_array_equal(
                np.asarray(ts1.observation[k]),
                np.asarray(ts2.observation[k]), err_msg=k)

    # no observation stays entirely constant under random actions — the
    # constancy window spans a SECOND episode, like the reference's
    # 2-episode trajectories (suite_test.py:253), so per-episode
    # constants (e.g. finger's target_position) count via re-randomization
    second = [env.reset()]
    spec = env.action_spec()
    rng2 = np.random.RandomState(3)
    for _ in range(3):
        a = rng2.uniform(np.maximum(spec.minimum, -1),
                         np.minimum(spec.maximum, 1)).astype(spec.dtype)
        second.append(env.step(a))
    for k in obs_spec:
        if (domain, k) in _CONSTANT_OBS_EXEMPT:
            continue
        stack = np.stack([np.asarray(ts.observation[k]).ravel()
                          for ts in steps + second])
        assert not np.all(stack == stack[0]), (
            f"observation {k!r} is constant over {n_steps} random steps "
            f"and an episode re-randomization")

    # initial state is randomized across episodes (reference :281-288)
    obs1 = env.reset().observation
    obs2 = env.reset().observation
    assert not all(np.array_equal(np.asarray(obs1[k]), np.asarray(obs2[k]))
                   for k in obs1), "consecutive resets identical"


def test_registry_matches_reference():
    ref = pytest.importorskip("dm_control.suite")
    assert set(ref.ALL_TASKS) - set(suite.ALL_TASKS) == set()
    assert set(suite.BENCHMARKING) == set(ref.BENCHMARKING)


@pytest.mark.parametrize("domain,task", FAST_TASKS[:4],
                         ids=[f"{d}:{t}" for d, t in FAST_TASKS[:4]])
def test_determinism(domain, task):
    def traj(seed):
        env = suite.load(domain, task, task_kwargs={"random": seed})
        env.reset()
        spec = env.action_spec()
        rng = np.random.RandomState(1)
        out = []
        for _ in range(5):
            a = rng.uniform(np.maximum(spec.minimum, -1),
                            np.minimum(spec.maximum, 1))
            ts = env.step(a)
            out.append(np.concatenate(
                [np.asarray(v).ravel() for v in ts.observation.values()]))
        return np.stack(out)

    np.testing.assert_array_equal(traj(5), traj(5))


def test_wrappers():
    from dm_control_tpu.suite.wrappers import action_noise, action_scale

    env = suite.load("pendulum", "swingup", task_kwargs={"random": 0})
    scaled = action_scale.Wrapper(env, minimum=-1, maximum=1)
    ts = scaled.reset()
    ts = scaled.step(np.array([0.3]))
    assert np.isfinite(ts.reward)

    env2 = suite.load("pendulum", "swingup", task_kwargs={"random": 0})
    noisy = action_noise.Wrapper(env2, scale=0.01)
    noisy.reset()
    ts = noisy.step(np.array([0.3]))
    assert np.isfinite(ts.reward)


def test_action_scale_affine_map():
    """Pins the rescaling math: new-bound endpoints land exactly on the
    wrapped env's native bounds, midpoint on the native midpoint."""
    from dm_env import specs

    from dm_control_tpu.suite.wrappers import action_scale

    class _Probe:
        """Minimal env recording the action it receives."""

        def __init__(self, lo, hi):
            self._spec = specs.BoundedArray(
                shape=(2,), dtype=np.float64, minimum=lo, maximum=hi)
            self.seen = None

        def action_spec(self):
            return self._spec

        def step(self, action):
            self.seen = np.array(action)
            return "ts"

        def reset(self):
            return "ts"

        def observation_spec(self):
            return {}

    probe = _Probe(lo=[0.0, -2.0], hi=[4.0, 2.0])
    w = action_scale.Wrapper(probe, minimum=-1, maximum=1)
    spec = w.action_spec()
    np.testing.assert_array_equal(spec.minimum, -1)
    np.testing.assert_array_equal(spec.maximum, 1)
    w.step(np.array([-1.0, -1.0]))
    np.testing.assert_allclose(probe.seen, [0.0, -2.0])
    w.step(np.array([1.0, 1.0]))
    np.testing.assert_allclose(probe.seen, [4.0, 2.0])
    w.step(np.array([0.0, 0.0]))
    np.testing.assert_allclose(probe.seen, [2.0, 0.0])
    assert probe.seen.dtype == np.float64

    with pytest.raises(ValueError, match="BoundedArray"):
        class _Unbounded(_Probe):
            def action_spec(self):
                return specs.Array(shape=(2,), dtype=np.float64)
        action_scale.Wrapper(_Unbounded([0], [1]), -1, 1)
    with pytest.raises(ValueError, match="finite"):
        action_scale.Wrapper(_Probe([0.0, -2.0], [4.0, 2.0]),
                             minimum=-np.inf, maximum=1)
    with pytest.raises(ValueError, match="broadcast"):
        action_scale.Wrapper(_Probe([0.0, -2.0], [4.0, 2.0]),
                             minimum=[-1, -1, -1], maximum=1)


def test_action_noise_clips_to_bounds():
    from dm_control_tpu.suite.wrappers import action_noise

    env = suite.load("pendulum", "swingup", task_kwargs={"random": 0})
    noisy = action_noise.Wrapper(env, scale=10.0)  # huge noise
    noisy.reset()
    spec = env.action_spec()
    seen = []
    orig_step = env.step
    env.step = lambda a: (seen.append(np.array(a)), orig_step(a))[1]
    for _ in range(8):
        noisy.step(np.zeros(spec.shape))
    acts = np.stack(seen)
    assert np.all(acts >= spec.minimum - 1e-12)
    assert np.all(acts <= spec.maximum + 1e-12)
    assert np.std(acts) > 0.1  # the noise actually perturbs
