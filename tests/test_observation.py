"""Observation scheduler semantics (Updater + Buffer).

Ports the reference's fake-physics scheduler scenarios
(dm_control/composer/observation/updater_test.py:166-268 and
obs_buffer_test.py): per-observable update intervals, buffer sizes,
delays with out-of-order arrival, and the planned-drop optimization.
"""

import itertools
import math

import numpy as np

from dm_control_tpu.composer.observation.obs_buffer import Buffer
from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.composer.observation.updater import Updater


class DeterministicSequence:

    def __init__(self, sequence):
        self._iter = itertools.cycle(sequence)

    def __call__(self, random_state=None):
        del random_state
        return next(self._iter)


class FakePhysics:
    """Counter-valued observables (reference fake_physics.py:25)."""

    def __init__(self):
        self._step_counter = 0

    def step(self):
        self._step_counter += 1

    def twice(self):
        return 2 * self._step_counter

    def repeated(self):
        return [self._step_counter, self._step_counter]

    def sqrt(self):
        return np.sqrt(self._step_counter)

    def matrix(self):
        return [[self._step_counter] * 3] * 2

    def time(self):
        return self._step_counter


def test_buffer_out_of_order_arrival():
    buf = Buffer(buffer_size=3, shape=(), dtype=float)
    buf.insert(0, 3, 0.0)   # arrives at 3
    buf.insert(3, 5, 3.0)   # arrives at 8
    buf.insert(5, 2, 5.0)   # arrives at 7 — BEFORE the obs made at 3
    np.testing.assert_array_equal(buf.read(10), [0.0, 5.0, 3.0])


def test_buffer_pads_until_arrival():
    buf = Buffer(buffer_size=2, shape=(), dtype=float)
    buf.insert(0, 4, 7.0)
    np.testing.assert_array_equal(buf.read(0), [0.0, 0.0])
    np.testing.assert_array_equal(buf.read(3), [0.0, 0.0])
    np.testing.assert_array_equal(buf.read(4), [0.0, 7.0])


def test_buffer_planned_drop():
    """Items pushed out of the window before any read are pruned
    (reference obs_buffer.py:111-199)."""
    buf = Buffer(buffer_size=1, shape=(), dtype=float)
    schedule = [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)]
    buf.drop_unobserved_upcoming_items(schedule, read_interval=5)
    # only the final capture survives: earlier ones are overwritten
    # before the read at t=5
    assert schedule == [(5, 0)]


def test_updater_schedules_intervals_buffers_delays():
    """Port of updater_test.py testObservation (adjusted: implicit
    size-1 buffers are served without the leading buffer dim)."""
    physics = FakePhysics()
    observables = {
        "twice": Generic(FakePhysics.twice),
        "repeated": Generic(FakePhysics.repeated, update_interval=5,
                            buffer_size=5),
        "matrix": Generic(FakePhysics.matrix, update_interval=3, delay=1),
        "sqrt": Generic(FakePhysics.sqrt, update_interval=7,
                        buffer_size=3, delay=2),
    }
    for obs in observables.values():
        obs.enabled = True
    n_sub = 5
    upd = Updater(observables, n_sub)
    upd.reset(physics=physics, random_state=None)

    for control_step in range(60):
        upd.prepare_for_next_control_step()
        for _ in range(n_sub):
            physics.step()
            upd.update(physics, None)
        t = (control_step + 1) * n_sub
        obs = upd.get_observation()

        def expect(name, fn, t=t, obs=obs):
            o = observables[name]
            interval = o.update_interval or 1
            buffer_size = o.buffer_size or 1
            delay = o.delay or 0
            end = interval * int(math.floor((t - delay) / interval))
            start = end - (buffer_size - 1) * interval
            rng = range(max(0, start), max(0, end + 1), interval)
            expected = np.zeros(np.asarray(obs[name]).shape,
                                np.asarray(obs[name]).dtype)
            buffered = o.buffer_size is not None
            for i, ts in enumerate(reversed(rng)):
                if buffered:
                    expected[-(i + 1)] = fn(ts)
                else:
                    expected = np.asarray(fn(ts), expected.dtype)
                    break
            np.testing.assert_array_equal(obs[name], expected,
                                          err_msg=f"{name} at t={t}")

        expect("twice", lambda x: 2 * x)
        expect("matrix", lambda x: [[x] * 3] * 2)
        expect("repeated", lambda x: [x, x])
        expect("sqrt", np.sqrt)


def test_updater_variable_rates_and_delays():
    """Port of updater_test.py testVariableRatesAndDelays — the
    out-of-order arrival + cross-control-boundary-drop scenario."""
    physics = FakePhysics()
    observables = {
        "time": Generic(
            lambda p: p.time(), buffer_size=3,
            # produced at 20N + [0, 3, 5, 8, 11, 15, 16]
            update_interval=DeterministicSequence([3, 2, 3, 3, 4, 1, 4]),
            # arriving at 20N + [3, 8, 7, 12, 11, 17, 20]
            delay=DeterministicSequence([3, 5, 2, 5, 1, 2, 4])),
    }
    observables["time"].enabled = True
    n_sub = 10
    upd = Updater(observables, n_sub)
    upd.reset(physics=physics, random_state=None)

    for i in range(5):
        upd.prepare_for_next_control_step()
        for _ in range(n_sub):
            physics.step()
            upd.update(physics, None)
        np.testing.assert_array_equal(
            upd.get_observation()["time"], 20 * i + np.array([0, 5, 3]))

        upd.prepare_for_next_control_step()
        for _ in range(n_sub):
            physics.step()
            upd.update(physics, None)
        # #11 is dropped: it arrives after #8, whose large delay crossed
        # the control boundary at #10
        np.testing.assert_array_equal(
            upd.get_observation()["time"], 20 * i + np.array([8, 15, 16]))
