"""Lift tasks (reference: dm_control/manipulation/lift.py:60-240).

``lift_brick``: raise a Duplo brick 0.3m above its initial height.
``lift_large_box``: same with a large box that can't be pinch-grasped.

Height is measured at the prop's LOWEST vertex site (reference
lift.py:63 `_VertexSitesMixin`): tipping the prop up on one edge does
not count as lifting it.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.entities.props.duplo import Duplo
from dm_control_tpu.entities.props.primitive import Primitive
from dm_control_tpu.manipulation.shared import registry
from dm_control_tpu.manipulation.shared import observations as obs_mod
from dm_control_tpu.manipulation.shared import workspaces
from dm_control_tpu.manipulation.shared.task import ArmTask
from dm_control_tpu.utils import rewards

_DISTANCE_TO_LIFT = 0.3  # reference lift.py:60

_PROP_BOX = workspaces.BoundingBox(
    lower=(-0.15, -0.1, 0.02), upper=(0.15, 0.15, 0.08))


def _add_vertex_sites(body, center, half_size):
    """Adds 8 corner sites to ``body``; returns their (local) names."""
    names = []
    for i in range(8):
        sign = np.array([(-1, 1)[(i >> k) & 1] for k in range(3)])
        pos = np.asarray(center) + sign * np.asarray(half_size)
        name = f"vertex_{i}"
        body.add("site", name=name, pos=" ".join(f"{v:g}" for v in pos),
                 type="sphere", size="0.002", group="3")
        names.append(name)
    return names, float(center[2]) - float(half_size[2])


class _VertexSitesMixin:
    """Lowest-vertex height measurement (reference lift.py:63)."""

    _vertex_names = ()
    #: z of the lowest vertex relative to the free-joint origin (used by
    #: the batched init, where props spawn with identity orientation)
    lowest_vertex_offset = 0.0

    def vertex_site_names(self):
        """Fully-qualified vertex site names (valid once attached)."""
        return [f"{self.name}/{n}" for n in self._vertex_names]

    def lowest_vertex_height(self, physics):
        return min(
            float(np.asarray(physics.named_field("site_xpos", n))[2])
            for n in self.vertex_site_names())


class _DuploWithVertexSites(Duplo, _VertexSitesMixin):
    """Duplo with sites at the corners of its bounding site
    (reference lift.py:93)."""

    def _build(self, **kwargs):
        super()._build(**kwargs)
        body = self._mjcf_root.find("body", "brick")
        self._vertex_names, self.lowest_vertex_offset = _add_vertex_sites(
            body, center=(0, 0, 0.0119), half_size=(0.016, 0.0319, 0.012))


class _BoxWithVertexSites(Primitive, _VertexSitesMixin):
    """Box with corner vertex sites (reference lift.py:85)."""

    def _build(self, size, **kwargs):
        super()._build(geom_type="box", size=size, **kwargs)
        self._vertex_names, self.lowest_vertex_offset = _add_vertex_sites(
            self.geom.parent, center=(0, 0, 0), half_size=size)


class Lift(ArmTask):
    """Raise the prop above a target height (reference lift.py:100
    `_Lift`)."""

    def __init__(self, prop, obs_settings=None):
        super().__init__(obs_settings=obs_settings)
        self._prop = prop
        self._add_free_prop(prop)
        if self._obs_settings.prop_pose.enabled:
            prop.observables.enable_all()
        self._target_height = 0.0
        self._init_height = 0.0

    def initialize_episode(self, physics, random_state):
        super().initialize_episode(physics, random_state)
        pos = self._place_prop(physics, self._prop, _PROP_BOX,
                               random_state)
        physics.forward()
        self._init_height = self._prop.lowest_vertex_height(physics)
        # reference lift.py:190
        self._target_height = _DISTANCE_TO_LIFT + self._init_height

    def get_reward(self, physics):
        # reference lift.py:179 — linear shaping from initial to target
        # height (of the LOWEST vertex), plus a small reach-shaping term
        # to guide the arm.
        prop_height = self._prop.lowest_vertex_height(physics)
        lift = rewards.tolerance(
            prop_height, bounds=(self._target_height, float("inf")),
            margin=_DISTANCE_TO_LIFT, value_at_margin=0.0,
            sigmoid="linear")
        reach_dist = float(np.linalg.norm(
            self._pinch_position(physics) - self._prop.position(physics)))
        reach = rewards.tolerance(reach_dist, bounds=(0, 0.05),
                                  margin=0.3)
        return 0.8 * lift + 0.2 * reach

    # -- batched path (composer.batch.BatchableTask) -------------------------

    def batch_model_diff(self, m):
        import jax.numpy as jnp

        return {"_target_height": jnp.zeros((), m.dtype)}

    def batch_init(self, m, qpos, qvel, rc, diff):
        import jax.numpy as jnp

        qpos = self._batch_randomize_arm(m, qpos, rc)
        adr, _ = self._free_joint(m, self._prop)
        pos = rc.uniform(jnp.asarray(_PROP_BOX.lower),
                         jnp.asarray(_PROP_BOX.upper))
        qpos = qpos.at[adr:adr + 3].set(pos)
        # reference lift.py:190 — target is the initial LOWEST-vertex
        # height + lift distance (identity orientation at spawn)
        diff = dict(diff, _target_height=jnp.asarray(
            pos[2] + self._prop.lowest_vertex_offset + _DISTANCE_TO_LIFT,
            m.dtype))
        return qpos, qvel, diff

    def batch_observation(self, m, d):
        import collections

        obs = collections.OrderedDict()
        self._batch_arm_obs(m, d, obs)
        _, bid = self._free_joint(m, self._prop)
        obs["prop_position"] = d.xpos[bid]
        obs["prop_quaternion"] = d.xquat[bid]
        obs["pinch_position"] = d.site_xpos[self._pinch_site_id(m)]
        obs["target_height"] = m.task_state["_target_height"][None]
        return obs

    def batch_reward(self, m, d):
        import jax.numpy as jnp

        _, bid = self._free_joint(m, self._prop)
        vids = jnp.asarray([m.names.site[n]
                            for n in self._prop.vertex_site_names()])
        prop_height = jnp.min(d.site_xpos[vids, 2])
        target = m.task_state["_target_height"]
        lift = rewards.tolerance(
            prop_height, bounds=(target, jnp.inf),
            margin=_DISTANCE_TO_LIFT, value_at_margin=0.0,
            sigmoid="linear")
        reach_dist = jnp.linalg.norm(
            d.site_xpos[self._pinch_site_id(m)] - d.xpos[bid])
        reach = rewards.tolerance(reach_dist, bounds=(0, 0.05), margin=0.3)
        return 0.8 * lift + 0.2 * reach


def _make(prop_name, obs_settings):
    from dm_control_tpu import composer

    if prop_name == "brick":
        prop = _DuploWithVertexSites(name="brick")
    else:
        prop = _BoxWithVertexSites(size=(0.06, 0.06, 0.06),
                                   mass=0.3, name="large_box",
                                   friction="1.5 0.01 0.001")
    task = Lift(prop, obs_settings=obs_settings)
    return composer.Environment(task, time_limit=10.0)


@registry.add(registry.tags.FEATURES, registry.tags.EASY)
def lift_brick_features():
    return _make("brick", obs_mod.PERFECT_FEATURES)


@registry.add(registry.tags.VISION, registry.tags.EASY)
def lift_brick_vision():
    return _make("brick", obs_mod.VISION)


@registry.add(registry.tags.FEATURES, registry.tags.EASY)
def lift_large_box_features():
    return _make("large_box", obs_mod.PERFECT_FEATURES)


@registry.add(registry.tags.VISION, registry.tags.EASY)
def lift_large_box_vision():
    return _make("large_box", obs_mod.VISION)
