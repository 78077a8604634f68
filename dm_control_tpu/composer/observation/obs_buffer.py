"""Ring buffer for delayed / aggregated observations.

Reference: dm_control/composer/observation/obs_buffer.py:46-199 — supports
out-of-order arrival (per-observation delays) and returns the most recent
``buffer_size`` values that have *arrived* by the read time.
"""

from __future__ import annotations

import collections

import numpy as np


class Buffer:
    """Stores (timestamp, arrival_time, value) and serves arrived values."""

    def __init__(self, buffer_size, shape, dtype, pad_value=0.0):
        self._buffer_size = buffer_size
        self._shape = shape
        self._dtype = dtype
        self._entries = []  # (obs_timestamp, arrival_timestamp, value)
        self._pad = np.full(shape, pad_value, dtype=dtype)

    @property
    def shape(self):
        return (self._buffer_size,) + tuple(self._shape)

    def insert(self, timestamp, delay, value):
        self._entries.append((timestamp, timestamp + delay,
                              np.asarray(value, dtype=self._dtype)))
        # keep bounded: drop entries that can never be served again
        if len(self._entries) > 4 * self._buffer_size + 8:
            self._entries.sort(key=lambda e: e[1])
            self._entries = self._entries[-(4 * self._buffer_size + 8):]

    def read(self, current_time):
        """The last ``buffer_size`` values that have arrived, oldest first,
        left-padded when fewer than ``buffer_size`` have arrived."""
        arrived = sorted(
            (e for e in self._entries if e[1] <= current_time),
            key=lambda e: (e[0], e[1]))
        values = [e[2] for e in arrived[-self._buffer_size:]]
        while len(values) < self._buffer_size:
            values.insert(0, self._pad)
        return np.stack(values)

    def drop_unobserved_upcoming_items(self, observation_schedule,
                                       read_interval):
        """Plans future capture times, dropping those that cannot be
        observed (the reference's planning optimization,
        obs_buffer.py:111-199).  Returns the filtered schedule."""
        # conservative: keep everything (correct, merely less optimal)
        return observation_schedule
