"""Collision-free prop placement via rejection sampling
(reference: dm_control/composer/initializers/prop_initializer.py:41)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.variation.base import evaluate


class PropPlacer:
    """Places free props at sampled poses until penetration-free."""

    def __init__(self, props, position, quaternion=None,
                 ignore_collisions=False, max_attempts_per_prop=40,
                 settle_physics=False):
        self._props = props
        self._position = position
        self._quaternion = quaternion
        self._ignore_collisions = ignore_collisions
        self._max_attempts = max_attempts_per_prop
        self._settle = settle_physics

    def __call__(self, physics, random_state):
        import jax.numpy as jnp

        from dm_control_tpu.physics import engine

        for prop in self._props:
            placed = False
            for _ in range(self._max_attempts):
                pos = np.asarray(evaluate(
                    self._position, random_state=random_state))
                quat = (np.asarray(evaluate(
                    self._quaternion, random_state=random_state))
                    if self._quaternion is not None
                    else np.array([1.0, 0, 0, 0]))
                prop.set_pose(physics, pos, quat)
                if self._ignore_collisions:
                    placed = True
                    break
                d = engine.fwd_position(physics.model, physics.data)
                if not bool(jnp.any(d.contact.dist < 0)):
                    placed = True
                    break
            if not placed:
                raise RuntimeError(
                    f"Failed to place prop {prop.name!r} without collisions "
                    f"after {self._max_attempts} attempts.")
        if self._settle:
            physics.step(200)
