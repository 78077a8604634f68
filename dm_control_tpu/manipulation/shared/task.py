"""Common base task for arm manipulation.

Reference: dm_control/manipulation/shared/__init__ composition pattern —
each task file (reach.py:95, lift.py:100, place.py:140, bricks.py:200)
builds Standard arena + Jaco arm + hand + props.  The arm is the real
Kinova Jaco (entities/manipulators/kinova.py — transcribed model with
oracle-baked inertials and box collision proxies); the primitive arm
(entities/manipulators/arm.py) remains available via ``use_jaco=False``.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.batch import BatchableTask
from dm_control_tpu.entities.manipulators.arm import (PrimitiveArm,
                                                      PrimitiveHand)
from dm_control_tpu.entities.manipulators.kinova import JacoArm, JacoHand
from dm_control_tpu.manipulation.shared import arenas, constants
from dm_control_tpu.manipulation.shared import observations as obs_mod
from dm_control_tpu.manipulation.shared import workspaces


class ArmTask(composer.Task, BatchableTask):
    """Arena + arm + hand; subclasses add props and rewards."""

    def __init__(self, obs_settings=None, use_jaco=True):
        self._obs_settings = obs_settings or obs_mod.PERFECT_FEATURES
        self._arena = arenas.Standard()
        if use_jaco:
            self._arm = JacoArm(name="arm")
            self._hand = JacoHand(name="hand")
        else:
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
        name = (f"{self._arm.name}/{self._hand.name}/"
                f"{self._hand.pinch_site_name}")
        return np.asarray(physics.named_field("site_xpos", name))

    def _place_prop(self, physics, prop, box, random_state,
                    quaternion=(1.0, 0.0, 0.0, 0.0)):
        pos = workspaces.uniform_in_box(box, random_state)
        prop.set_pose(physics, position=pos, quaternion=quaternion)
        return pos

    def _arm_joint_mids(self, m):
        """Per-joint home angle: mid-range for limited joints, 0 for
        unlimited (the Jaco's joint_2/joint_3 ranges exclude 0)."""
        import numpy as onp

        mids = []
        for j in self._arm.joints:
            jid = m.names.joint[f"{self._arm.name}/{j}"]
            if m.jnt_limited[jid]:
                lo, hi = onp.asarray(m.jnt_range)[jid]
                mids.append(0.5 * (float(lo) + float(hi)))
            else:
                mids.append(0.0)
        return onp.asarray(mids)

    def _randomize_arm(self, physics, random_state):
        """Perturbs arm joint angles around the home pose (reference
        initializers/ToolCenterPointInitializer samples TCP poses; here
        joints start near mid-range instead)."""
        mids = self._arm_joint_mids(physics.model)
        angles = mids + random_state.uniform(-0.2, 0.2,
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
            f"{self._arm.name}/{self._hand.name}/"
            f"{self._hand.pinch_site_name}"]

    def _free_joint(self, m, entity):
        """(qpos_adr, body_id) of a free entity's root joint (named
        '<frame>_root' by Arena.add_free_entity)."""
        for name, j in m.names.joint.items():
            if name.startswith(entity.name) and name.endswith("_root"):
                return int(m.jnt_qposadr[j]), int(m.jnt_bodyid[j])
        raise KeyError(f"no free root joint for entity {entity.name!r}")

    def _batch_randomize_arm(self, m, qpos, rc):
        """jax mirror of _randomize_arm (mid-range + uniform(-0.2, 0.2))."""
        mids = self._arm_joint_mids(m)
        angles = mids + rc.uniform(-0.2, 0.2,
                                   size=len(self._arm.joints))
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
