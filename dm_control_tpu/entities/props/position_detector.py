"""Inside-region position detector
(reference: dm_control/entities/props/position_detector.py)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.mjcf.element import Element


class PositionDetector(composer.Entity):
    """Detects entities whose position lies inside an axis-aligned box."""

    def _build(self, pos, size, name="detector"):
        self._pos = np.asarray(pos, float)
        self._size = np.asarray(size, float)
        root = Element("mujoco", {"model": name})
        wb = root.add("worldbody")
        body = wb.add("body", name="body",
                      pos=" ".join(str(p) for p in pos))
        body.add("site", name="region", type="box",
                 size=" ".join(str(s) for s in size), group="4")
        self._mjcf_root = root
        self._detected = []

    @property
    def detected(self):
        return tuple(self._detected)

    def initialize_episode(self, physics, random_state):
        self._detected = []

    def update(self, physics, entity_positions):
        """Returns which of the given positions are inside the region."""
        center = np.asarray(physics.named_field(
            "xpos", self.attachment_frame.get("name")))
        inside = []
        for i, p in enumerate(entity_positions):
            if np.all(np.abs(np.asarray(p) - center) <= self._size):
                inside.append(i)
        self._detected = inside
        return inside

    def site_pos(self, physics):
        return np.asarray(physics.named_field(
            "xpos", self.attachment_frame.get("name")))
