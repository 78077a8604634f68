"""Soccer pitch arena (reference: dm_control/locomotion/soccer/
pitch.py:201-606, incl. Goal detectors)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.composer.arena import Arena


class Goal:
    """An axis-aligned inside-region detector
    (reference pitch.py:606 / entities PositionDetector)."""

    def __init__(self, lower, upper, team):
        self.lower = np.asarray(lower, float)
        self.upper = np.asarray(upper, float)
        self.team = team

    def detect(self, point) -> bool:
        p = np.asarray(point)
        return bool(np.all(p >= self.lower) and np.all(p <= self.upper))


class Pitch(Arena):
    """A bounded field with two goals."""

    def _build(self, size=(12, 9), goal_size=(0.5, 2.6, 1.2),
               name="pitch"):
        super()._build(name=name)
        self._size = size
        wb = self._mjcf_root.first("worldbody")
        wb.add("geom", name="field", type="plane",
               size=f"{size[0]} {size[1]} 0.25",
               friction="0.7 0.005 0.0001")
        # perimeter walls
        for i, (pos, zaxis, sz) in enumerate([
                ((0, size[1], 0.5), (0, -1, 0), (size[0], 1, 0.5)),
                ((0, -size[1], 0.5), (0, 1, 0), (size[0], 1, 0.5)),
                ((size[0], 0, 0.5), (-1, 0, 0), (size[1], 1, 0.5)),
                ((-size[0], 0, 0.5), (1, 0, 0), (size[1], 1, 0.5))]):
            wb.add("geom", name=f"wall_{i}", type="plane",
                   pos=" ".join(map(str, pos)),
                   zaxis=" ".join(map(str, zaxis)),
                   size=" ".join(map(str, sz)))
        gx, gy, gz = goal_size
        self._home_goal = Goal(
            lower=(-size[0], -gy, 0), upper=(-size[0] + gx, gy, gz),
            team="home")
        self._away_goal = Goal(
            lower=(size[0] - gx, -gy, 0), upper=(size[0], gy, gz),
            team="away")
        for side, x in (("home", -size[0] + gx / 2),
                        ("away", size[0] - gx / 2)):
            wb.add("site", name=f"{side}_goal", type="box",
                   pos=f"{x} 0 {gz / 2}", size=f"{gx / 2} {gy} {gz / 2}",
                   group="4")

    @property
    def size(self):
        return self._size

    @property
    def home_goal(self):
        return self._home_goal

    @property
    def away_goal(self):
        return self._away_goal

    def detected_goal(self, ball_pos):
        """Which goal (if any) contains the ball."""
        if self._home_goal.detect(ball_pos):
            return self._home_goal
        if self._away_goal.detect(ball_pos):
            return self._away_goal
        return None


class RandomizedPitch(Pitch):
    """Pitch whose size is sampled at construction
    (reference pitch.py:325)."""

    def _build(self, min_size=(8, 6), max_size=(16, 12), name="pitch",
               random_state=None, **kwargs):
        rng = random_state or np.random
        size = (rng.uniform(min_size[0], max_size[0]),
                rng.uniform(min_size[1], max_size[1]))
        super()._build(size=size, name=name, **kwargs)
