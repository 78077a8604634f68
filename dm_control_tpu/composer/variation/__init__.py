"""Parameter randomization DSL (reference: dm_control/composer/variation/).
"""

from dm_control_tpu.composer.variation.base import Variation, evaluate  # noqa: F401
from dm_control_tpu.composer.variation import distributions, noises  # noqa: F401


class MJCFVariator:
    """Applies per-episode variations to element attributes, remembering
    and restoring original values (reference variation/__init__.py:34).

    Note: attribute variation implies model recompilation; prefer
    ``PhysicsVariator`` (array-leaf variation) on the TPU hot path.
    """

    def __init__(self):
        self._initial = {}

    def apply_variations(self, element, variations, random_state):
        for attr, variation in variations.items():
            key = (id(element), attr)
            if key not in self._initial:
                self._initial[key] = element.get(attr)
            initial = self._initial[key]
            element.attrib[attr] = evaluate(
                variation, initial_value=initial,
                current_value=element.get(attr), random_state=random_state)

    def reset_initial_values(self):
        self._initial.clear()


class PhysicsVariator:
    """Applies variations to model/data arrays each episode
    (reference variation/__init__.py:90) — the TPU-idiomatic path: array
    leaves change, the compiled program does not."""

    def __init__(self):
        self._initial = {}

    def apply_variations(self, physics, specs, random_state):
        """``specs``: list of (field, index, variation)."""
        import jax.numpy as jnp
        import numpy as np

        model = physics.model
        updates = {}
        for field, index, variation in specs:
            arr = updates.get(field, np.asarray(getattr(model, field)).copy())
            key = (field, index)
            if key not in self._initial:
                self._initial[key] = arr[index]
            arr[index] = evaluate(
                variation, initial_value=self._initial[key],
                current_value=arr[index], random_state=random_state)
            updates[field] = arr
        if updates:
            physics._model = model.replace(
                **{k: jnp.asarray(v) for k, v in updates.items()})
