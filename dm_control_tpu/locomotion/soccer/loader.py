"""soccer.load entry point
(reference: dm_control/locomotion/soccer/__init__.py:92)."""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu.locomotion.soccer.boxhead import BoxHead
from dm_control_tpu.locomotion.soccer.pitch import Pitch
from dm_control_tpu.locomotion.soccer.soccer_ball import SoccerBall
from dm_control_tpu.locomotion.soccer.task import Player, Task

WALKER_TYPES = {"boxhead": BoxHead}


def load(team_size=2, time_limit=45.0, random_state=None,
         walker_type="boxhead", pitch_size=(12, 9)):
    """Builds an N-vs-N soccer environment."""
    walker_cls = WALKER_TYPES[walker_type]
    players = []
    for team in ("home", "away"):
        for i in range(team_size):
            players.append(Player(
                team, walker_cls(name=f"{team}_{i}")))
    task = Task(players, Pitch(size=pitch_size), SoccerBall())
    return composer.Environment(task, time_limit=time_limit,
                                random_state=random_state)
