"""Soccer ball entity (reference: dm_control/locomotion/soccer/
soccer_ball.py:50, incl. hit/intercept tracking)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.mjcf.element import Element


class SoccerBall(composer.Entity):
    """A rolling ball with contact-based possession tracking."""

    def _build(self, radius=0.35, mass=0.045, friction=(0.7, 0.075, 0.075),
               name="soccer_ball"):
        root = Element("mujoco", {"model": name})
        wb = root.add("worldbody")
        body = wb.add("body", name="body", pos=f"0 0 {radius}")
        body.add("geom", name="geom", type="sphere", size=str(radius),
                 mass=str(mass), condim="6", priority="1",
                 friction=" ".join(str(f) for f in friction))
        self._mjcf_root = root
        self._radius = radius
        self._last_hit = None
        self._hit = False
        self._repossessed = False
        self._intercepted = False

    @property
    def radius(self):
        return self._radius

    @property
    def last_hit(self):
        """The player that last contacted the ball
        (reference soccer_ball.py hit tracking)."""
        return self._last_hit

    @property
    def hit(self):
        return self._hit

    @property
    def repossessed(self):
        return self._repossessed

    @property
    def intercepted(self):
        return self._intercepted

    def register_player(self, player):
        pass  # contact-id registration is handled via geometry queries

    def initialize_entity_trackers(self):
        self._last_hit = None
        self._hit = False
        self._repossessed = False
        self._intercepted = False

    def initialize_episode(self, physics, random_state):
        self.initialize_entity_trackers()

    def clear_step_flags(self):
        """Per-control-step flags reset; last_hit persists (reference
        soccer_ball.py after_substep semantics)."""
        self._hit = False
        self._repossessed = False
        self._intercepted = False

    def update_hit(self, player, teammate: bool):
        self._hit = True
        if self._last_hit is not player:
            self._repossessed = True
            if self._last_hit is not None and not teammate:
                self._intercepted = True
        self._last_hit = player

    def position(self, physics):
        return np.asarray(physics.named_field(
            "xpos", self.attachment_frame.get("name")))
