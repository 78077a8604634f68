"""Common base task for arm manipulation.

Reference: dm_control/manipulation/shared/__init__ composition pattern —
each task file (reach.py:95, lift.py:100, place.py:140, bricks.py:200)
builds Standard arena + Jaco arm + hand + props.  Here the mesh-based
Jaco is replaced by the primitive-geometry arm
(dm_control_tpu/entities/manipulators/arm.py); everything else follows
the same structure.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.batch import BatchableTask
from dm_control_tpu.entities.manipulators.arm import (PrimitiveArm,
                                                      PrimitiveHand)
from dm_control_tpu.manipulation.shared import arenas, constants
from dm_control_tpu.manipulation.shared import observations as obs_mod
from dm_control_tpu.manipulation.shared import workspaces


class ArmTask(composer.Task, BatchableTask):
    """Arena + arm + hand; subclasses add props and rewards."""

    def __init__(self, obs_settings=None):
        self._obs_settings = obs_settings or obs_mod.PERFECT_FEATURES
        self._arena = arenas.Standard()
        self._arm = PrimitiveArm(name="arm")
        self._hand = PrimitiveHand(name="hand")
        self._arm.attach_hand(self._hand)
        self._arena.attach_offset(self._arm, offset=(0, 0.4, 0))
        self._task_observables = {}
        if self._obs_settings.proprio.enabled:
            self._arm.observables.joints_pos.enabled = True
            self._arm.observables.joints_vel.enabled = True
        if self._obs_settings.ftt.enabled:
            self._arm.observables.joints_torque.enabled = True
        self.set_timesteps(constants.CONTROL_TIMESTEP,
                           constants.PHYSICS_TIMESTEP)

    @property
    def root_entity(self):
        return self._arena

    @property
    def arm(self):
        return self._arm

    @property
    def hand(self):
        return self._hand

    @property
    def task_observables(self):
        return self._task_observables

    # -- helpers ------------------------------------------------------------

    def _add_free_prop(self, prop):
        return self._arena.add_free_entity(prop)

    def _pinch_position(self, physics):
        """World position of the hand's pinch site."""
        name = f"{self._arm.name}/{self._hand.name}/pinch_site"
        return np.asarray(physics.named_field("site_xpos", name))

    def _place_prop(self, physics, prop, box, random_state,
                    quaternion=(1.0, 0.0, 0.0, 0.0)):
        pos = workspaces.uniform_in_box(box, random_state)
        prop.set_pose(physics, position=pos, quaternion=quaternion)
        return pos

    def _randomize_arm(self, physics, random_state):
        """Perturbs arm joint angles slightly (reference initializers/
        ToolCenterPointInitializer samples TCP poses; the primitive arm
        starts near its home pose instead)."""
        angles = random_state.uniform(-0.2, 0.2,
                                      len(self._arm.joints))
        self._arm.set_joint_angles(physics, angles)

    def initialize_episode(self, physics, random_state):
        self._randomize_arm(physics, random_state)

    # -- batched-path (BatchableTask) helpers --------------------------------

    def _arm_qpos_addrs(self, m):
        return [int(m.jnt_qposadr[m.names.joint[f"{self._arm.name}/{j}"]])
                for j in self._arm.joints]

    def _arm_dof_addrs(self, m):
        return [int(m.jnt_dofadr[m.names.joint[f"{self._arm.name}/{j}"]])
                for j in self._arm.joints]

    def _pinch_site_id(self, m):
        return m.names.site[
            f"{self._arm.name}/{self._hand.name}/pinch_site"]

    def _free_joint(self, m, entity):
        """(qpos_adr, body_id) of a free entity's root joint (named
        '<frame>_root' by Arena.add_free_entity)."""
        for name, j in m.names.joint.items():
            if name.startswith(entity.name) and name.endswith("_root"):
                return int(m.jnt_qposadr[j]), int(m.jnt_bodyid[j])
        raise KeyError(f"no free root joint for entity {entity.name!r}")

    def _batch_randomize_arm(self, m, qpos, rc):
        """jax mirror of _randomize_arm (uniform(-0.2, 0.2) per joint)."""
        angles = rc.uniform(-0.2, 0.2, size=len(self._arm.joints))
        for i, adr in enumerate(self._arm_qpos_addrs(m)):
            qpos = qpos.at[adr].set(angles[i])
        return qpos

    def _batch_arm_obs(self, m, d, obs):
        import jax.numpy as jnp

        qadr = jnp.asarray(self._arm_qpos_addrs(m))
        dadr = jnp.asarray(self._arm_dof_addrs(m))
        obs["arm/joints_pos"] = d.qpos[qadr]
        obs["arm/joints_vel"] = d.qvel[dadr]
        return obs
