"""Viewer runtime state machine (reference viewer/runtime.py:75-232)."""

import numpy as np

from dm_control_tpu import suite
from dm_control_tpu.viewer import Application, Runtime, State
from dm_control_tpu.viewer.runtime import _get_default_action
from dm_control_tpu.viewer.util import Integrator, TimeMultiplier


def _env():
    return suite.load("pendulum", "swingup",
                      task_kwargs={"random": 0, "time_limit": 0.12})


def test_runtime_state_machine_full_episode():
    rt = Runtime(_env())
    assert rt.state == State.START
    rt.tick(0.05, paused=False)
    assert rt.state in (State.RUNNING, State.STOPPED)
    for _ in range(100):
        if rt.state == State.STOPPED:
            break
        rt.tick(0.05, paused=False)
    assert rt.state == State.STOPPED
    assert rt.last_action is not None


def test_runtime_pause_holds_time():
    rt = Runtime(_env())
    rt.tick(0.05, paused=False)
    t = rt.get_time()
    rt.tick(0.05, paused=True)
    assert rt.get_time() == t


def test_runtime_restart():
    rt = Runtime(_env())
    rt.tick(0.05, paused=False)
    rt.stop()
    assert rt.state == State.STOPPED
    rt.restart()
    assert rt.state == State.START
    rt.tick(0.05, paused=False)
    assert rt.state == State.RUNNING


def test_runtime_single_step():
    rt = Runtime(_env())
    rt.tick(0.0, paused=True)  # enter RUNNING without advancing
    t0 = rt.get_time()
    rt.single_step()
    assert rt.get_time() > t0


def test_runtime_policy_errors_absorbed():
    errors = []
    rt = Runtime(_env(), policy=lambda ts: 1 / 0)
    rt.on_error += errors.append
    rt.tick(0.05, paused=False)
    assert rt.state == State.STOPPED
    assert errors and isinstance(errors[0], ZeroDivisionError)


def test_default_action_is_bounds_midpoint():
    env = _env()
    a = _get_default_action(env.action_spec())
    spec = env.action_spec()
    np.testing.assert_allclose(a, (spec.minimum + spec.maximum) / 2)


def test_application_headless_loop():
    frames = []
    app = Application(width=32, height=32, fps=60)
    app.set_frame_callback(lambda f, rt: frames.append(f), render=True)
    stats = app.launch(_env(), max_episodes=1, max_seconds=20)
    assert len(stats) == 1
    assert frames and frames[-1].shape == (32, 32, 3)


def test_time_multiplier_and_integrator():
    tm = TimeMultiplier(1.0)
    tm.increase()
    assert tm.get() == 2.0
    tm.decrease()
    tm.decrease()
    assert tm.get() == 0.5
    assert str(tm) == "1/2"
    integ = Integrator(refresh_rate=0.0)
    integ.value = 4.0
    assert integ.value == 4.0
