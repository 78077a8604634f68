"""Observation settings presets
(reference: dm_control/manipulation/shared/observations.py:36-104)."""

from __future__ import annotations

import collections

ObservableSpec = collections.namedtuple(
    "ObservableSpec",
    ["enabled", "update_interval", "buffer_size", "delay", "aggregator",
     "corruptor"])

ObservationSettings = collections.namedtuple(
    "ObservationSettings", ["proprio", "ftt", "prop_pose", "camera"])

_ENABLED = ObservableSpec(enabled=True, update_interval=1, buffer_size=None,
                          delay=None, aggregator=None, corruptor=None)
_DISABLED = _ENABLED._replace(enabled=False)

# features: all state observables on, no cameras
PERFECT_FEATURES = ObservationSettings(
    proprio=_ENABLED, ftt=_ENABLED, prop_pose=_ENABLED, camera=_DISABLED)
# vision: proprio + camera, no privileged prop state
VISION = ObservationSettings(
    proprio=_ENABLED, ftt=_ENABLED, prop_pose=_DISABLED, camera=_ENABLED)


def make_options(obs_settings, obs_names):
    """Maps setting groups onto observable names
    (reference observations.py:104)."""
    out = {}
    for group, names in obs_names.items():
        spec = getattr(obs_settings, group)
        for name in names:
            out[name] = {"enabled": spec.enabled,
                         "update_interval": spec.update_interval,
                         "buffer_size": spec.buffer_size,
                         "delay": spec.delay,
                         "aggregator": spec.aggregator,
                         "corruptor": spec.corruptor}
    return out
