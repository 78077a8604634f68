"""Reach tasks (reference: dm_control/manipulation/reach.py:61-200).

``reach_site``: move the pinch site to a target site.
``reach_duplo``: move the pinch site to a free Duplo brick
(entities/props/duplo — real stud-coupling geometry).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.entities.props.duplo import Duplo
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
            self._prop = Duplo(name="brick")
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

    # -- batched path (composer.batch.BatchableTask) -------------------------

    def batch_model_diff(self, m):
        if self._use_site:
            return {"site_pos": m.site_pos}
        return {}

    def batch_init(self, m, qpos, qvel, rc, diff):
        import jax.numpy as jnp

        qpos = self._batch_randomize_arm(m, qpos, rc)
        if self._prop is not None:
            adr, _ = self._free_joint(m, self._prop)
            pos = rc.uniform(jnp.asarray(_PROP_BOX.lower),
                             jnp.asarray(_PROP_BOX.upper))
            qpos = qpos.at[adr:adr + 3].set(pos)
        else:
            tid = m.names.site["target"]
            tpos = rc.uniform(jnp.asarray(_TARGET_BOX.lower),
                              jnp.asarray(_TARGET_BOX.upper))
            diff = dict(diff, site_pos=diff["site_pos"].at[tid].set(tpos))
        return qpos, qvel, diff

    def _batch_target_pos(self, m, d):
        if self._prop is not None:
            _, bid = self._free_joint(m, self._prop)
            return d.xpos[bid]
        return d.site_xpos[m.names.site["target"]]

    def batch_observation(self, m, d):
        import collections

        obs = collections.OrderedDict()
        self._batch_arm_obs(m, d, obs)
        obs["target_position"] = self._batch_target_pos(m, d)
        obs["pinch_position"] = d.site_xpos[self._pinch_site_id(m)]
        return obs

    def batch_reward(self, m, d):
        import jax.numpy as jnp

        distance = jnp.linalg.norm(
            d.site_xpos[self._pinch_site_id(m)]
            - self._batch_target_pos(m, d))
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
