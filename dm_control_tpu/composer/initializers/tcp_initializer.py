"""Tool-center-point placement via inverse kinematics
(reference: dm_control/composer/initializers/tcp_initializer.py:30)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.variation.base import evaluate
from dm_control_tpu.utils import inverse_kinematics as ik


class ToolCenterPointInitializer:
    """Drives an arm's TCP site to a sampled target pose using IK."""

    def __init__(self, hand_site_name, arm_joint_names, position,
                 quaternion=None, max_ik_attempts=10):
        self._site_name = hand_site_name
        self._joint_names = list(arm_joint_names)
        self._position = position
        self._quaternion = quaternion
        self._max_attempts = max_ik_attempts

    def __call__(self, physics, random_state):
        import jax.numpy as jnp

        for _ in range(self._max_attempts):
            target_pos = np.asarray(evaluate(
                self._position, random_state=random_state))
            target_quat = (np.asarray(evaluate(
                self._quaternion, random_state=random_state))
                if self._quaternion is not None else None)
            result = ik.qpos_from_site_pose(
                physics.model, self._site_name, target_pos=target_pos,
                target_quat=target_quat, joint_names=self._joint_names,
                qpos0=np.asarray(physics.data.qpos))
            if result.success:
                physics._data = physics.data.replace(
                    qpos=jnp.asarray(result.qpos))
                physics.forward()
                return
        raise RuntimeError(
            f"IK failed to place TCP after {self._max_attempts} attempts.")
