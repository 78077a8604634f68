"""Viewer runtime: the environment/policy stepping state machine.

Reference: dm_control/viewer/runtime.py:75-232 — START → RUNNING →
STOP → STOPPED with RESTARTING, wall-clock-budgeted stepping against
simulation time, pause stepping, single-step, default actions from the
spec, and error absorption into listener callbacks.
"""

from __future__ import annotations

import enum

import numpy as np

from dm_control_tpu.viewer import util

_DEFAULT_MAX_SIM_STEP = 1.0 / 5


def _get_default_action(action_spec):
    """Midpoint of bounded dims, zero elsewhere
    (reference runtime.py:35)."""
    minimum = np.asarray(action_spec.minimum, float)
    maximum = np.asarray(action_spec.maximum, float)
    shape = action_spec.shape
    minimum = np.broadcast_to(minimum, shape)
    maximum = np.broadcast_to(maximum, shape)
    out = np.zeros(shape)
    bounded = np.isfinite(minimum) & np.isfinite(maximum)
    out[bounded] = 0.5 * (minimum[bounded] + maximum[bounded])
    return out


class State(enum.Enum):
    START = 0
    RUNNING = 1
    STOP = 2
    STOPPED = 3
    RESTARTING = 4


class Runtime:
    """Steps an environment with a policy under viewer control."""

    def __init__(self, environment, policy=None):
        self.on_error = util.QuietSet()
        self.on_episode_begin = util.QuietSet()
        self.on_physics_changed = util.QuietSet()
        self.simulation_time_budget = _DEFAULT_MAX_SIM_STEP
        self._state = State.START
        self._simulation_timer = util.Timer()
        self._tracked_simulation_time = 0.0
        self._error_logger = util.ErrorLogger(self.on_error)
        self._env = environment
        self._policy = policy
        self._default_action = _get_default_action(environment.action_spec())
        self._time_step = None
        self._last_action = None

    @property
    def state(self):
        return self._state

    @property
    def last_action(self):
        return self._last_action

    @property
    def simulation_time(self):
        return self._simulation_timer.measured_time

    def get_time(self):
        return float(self._env.physics.time())

    def tick(self, time_elapsed, paused):
        """Advances by one display frame (reference runtime.py:127)."""
        with self._simulation_timer.measure_time():
            if self._state == State.RESTARTING:
                self._state = State.START
            if self._state == State.START:
                if self._start():
                    for listener in self.on_episode_begin:
                        listener()
                    self._tracked_simulation_time = self.get_time()
                    self._state = State.RUNNING
                else:
                    self._state = State.STOPPED
            if self._state == State.RUNNING:
                if self._step_simulation(time_elapsed, paused):
                    self._state = State.STOP
            if self._state == State.STOP:
                self._state = State.STOPPED

    def _step_simulation(self, time_elapsed, paused):
        finished = False
        if paused:
            # paused: keep derived quantities fresh when the facade
            # supports it (a batched-state view may not expose forward)
            fwd = getattr(self._env.physics, "forward", None)
            if fwd is not None:
                fwd()
        else:
            step_duration = min(time_elapsed, self.simulation_time_budget)
            actual = self.get_time()
            if self._tracked_simulation_time >= actual:
                end_time = actual + step_duration
                while not finished and self.get_time() < end_time:
                    finished = self._step()
            self._tracked_simulation_time += step_duration
        return finished

    def single_step(self):
        if self._state == State.RUNNING:
            finished = self._step()
            self._state = State.STOP if finished else State.RUNNING

    def stop(self):
        self._state = State.STOPPED

    def restart(self):
        if self._state != State.STOPPED:
            self._state = State.RESTARTING
        else:
            self._state = State.START

    def _start(self):
        try:
            old_data = self._env.physics.data
        except AttributeError:
            old_data = None  # never reset: no physics state yet
        with self._error_logger:
            self._time_step = self._env.reset()
        if self._env.physics.data is not old_data:
            for listener in self.on_physics_changed:
                listener()
        return not self._error_logger.errors_found

    def _step(self):
        """One environment step; returns True when the episode finished
        (reference runtime.py _step)."""
        finished = True
        with self._error_logger:
            if self._policy is not None:
                action = self._policy(self._time_step)
            else:
                action = self._default_action
            self._last_action = action
            self._time_step = self._env.step(action)
            finished = self._time_step.last()
        return finished or self._error_logger.errors_found
