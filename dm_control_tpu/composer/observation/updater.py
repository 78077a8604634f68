"""Observation updater: schedules observable captures across substeps.

Reference: dm_control/composer/observation/updater.py:119-317 — during each
control step, observables with ``update_interval`` k are captured every k
physics substeps into ring buffers; ``get_observation`` reads buffered
values (applying delays and aggregators) at control-step boundaries.
"""

from __future__ import annotations

import collections

import numpy as np
from dm_env import specs


class _ObservableState:
    __slots__ = ("observable", "buffer", "next_update", "callable")

    def __init__(self, observable, buffer):
        self.observable = observable
        self.buffer = buffer
        self.next_update = 0
        self.callable = None


class Updater:
    """Drives enabled observables over the substep loop."""

    def __init__(self, observables, physics_steps_per_control_step=1,
                 strip_singleton_buffer_dim=False):
        self._observables = collections.OrderedDict(observables)
        self._n_sub = physics_steps_per_control_step
        self._strip = strip_singleton_buffer_dim
        self._states = None
        self._step_counter = 0

    def reset(self, physics, random_state):
        from dm_control_tpu.composer.observation.obs_buffer import Buffer

        self._step_counter = 0
        self._states = collections.OrderedDict()
        for name, obs in self._observables.items():
            if not obs.enabled:
                continue
            value = np.asarray(obs(physics, random_state))
            buffer_size = obs.buffer_size or 1
            buf = Buffer(buffer_size, value.shape, value.dtype)
            state = _ObservableState(obs, buf)
            buf.insert(0, 0, value)
            self._states[name] = state

    def prepare_for_next_control_step(self):
        pass  # captures are scheduled lazily in update()

    def update(self, physics, random_state):
        """Called once per physics substep."""
        self._step_counter += 1
        for state in self._states.values():
            interval = state.observable.update_interval
            if self._step_counter % max(1, int(interval)) == 0:
                delay = state.observable.delay or 0
                if callable(delay):
                    delay = delay(random_state)
                value = state.observable(physics, random_state)
                state.buffer.insert(self._step_counter, delay,
                                    np.asarray(value))

    def get_observation(self):
        out = collections.OrderedDict()
        for name, state in self._states.items():
            values = state.buffer.read(self._step_counter)
            agg = state.observable.aggregator
            if agg is not None:
                value = agg(values)
            elif state.observable.buffer_size is None and self._strip:
                value = values[-1]
            elif state.observable.buffer_size is None:
                value = values[-1]
            else:
                value = values
            out[name] = value
        return out

    def observation_spec(self):
        out = collections.OrderedDict()
        for name, state in self._states.items():
            sample = self.get_observation()[name]
            out[name] = specs.Array(shape=np.asarray(sample).shape,
                                    dtype=np.asarray(sample).dtype,
                                    name=name)
        return out
