"""Reach tasks (reference: dm_control/manipulation/reach.py:61-200).

``reach_site``: move the pinch site to a target site.
``reach_duplo``: move the pinch site to a free brick prop
(Duplo replaced by the primitive Brick — see entities/props/primitive.py).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.entities.props.primitive import Brick
from dm_control_tpu.manipulation.shared import constants, registry
from dm_control_tpu.manipulation.shared import observations as obs_mod
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.manipulation.shared.task import ArmTask
from dm_control_tpu.utils import rewards

_TARGET_RADIUS = 0.05  # reference reach.py:61

_TARGET_BOX = workspaces.BoundingBox(
    lower=(-0.2, -0.1, 0.05), upper=(0.2, 0.2, 0.35))
_PROP_BOX = workspaces.BoundingBox(
    lower=(-0.2, -0.1, 0.02), upper=(0.2, 0.2, 0.02))


class Reach(ArmTask):
    """Bring the pinch site within ``_TARGET_RADIUS`` of the target
    (reference reach.py:95 `_Reach`)."""

    def __init__(self, use_site, obs_settings=None):
        super().__init__(obs_settings=obs_settings)
        self._use_site = use_site
        self._target_pos = np.zeros(3)
        if use_site:
            self._prop = None
            wb = self._arena.mjcf_model.first("worldbody")
            self._target_site = wb.add(
                "site", name="target", type="sphere",
                size=str(_TARGET_RADIUS),
                rgba=" ".join(map(str, constants.RED)),
                group=str(constants.TASK_SITE_GROUP))
        else:
            self._prop = Brick(name="brick")
            self._add_free_prop(self._prop)
            if self._obs_settings.prop_pose.enabled:
                self._prop.observables.enable_all()

        def target_obs(physics):
            return np.asarray(self._target_position(physics), float)

        self._task_observables["target_position"] = Generic(target_obs)
        self._task_observables["target_position"].enabled = (
            self._obs_settings.prop_pose.enabled)

    def _target_position(self, physics):
        if self._prop is not None:
            return self._prop.position(physics)
        return self._target_pos

    def initialize_episode(self, physics, random_state):
        super().initialize_episode(physics, random_state)
        if self._prop is not None:
            self._place_prop(physics, self._prop, _PROP_BOX, random_state)
        else:
            self._target_pos = workspaces.uniform_in_box(
                _TARGET_BOX, random_state)

    def get_reward(self, physics):
        # reference reach.py:153
        distance = float(np.linalg.norm(
            self._pinch_position(physics) - self._target_position(physics)))
        return rewards.tolerance(distance, bounds=(0, _TARGET_RADIUS),
                                 margin=_TARGET_RADIUS)


def _make(use_site, obs_settings):
    from dm_control_tpu import composer

    task = Reach(use_site=use_site, obs_settings=obs_settings)
    return composer.Environment(task, time_limit=10.0)


@registry.add(registry.tags.FEATURES, registry.tags.EASY)
def reach_site_features():
    return _make(True, obs_mod.PERFECT_FEATURES)


@registry.add(registry.tags.VISION, registry.tags.EASY)
def reach_site_vision():
    return _make(True, obs_mod.VISION)


@registry.add(registry.tags.FEATURES, registry.tags.EASY)
def reach_duplo_features():
    return _make(False, obs_mod.PERFECT_FEATURES)


@registry.add(registry.tags.VISION, registry.tags.EASY)
def reach_duplo_vision():
    return _make(False, obs_mod.VISION)
