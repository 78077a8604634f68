"""soccer.load entry point
(reference: dm_control/locomotion/soccer/__init__.py:48-170)."""

from __future__ import annotations

import enum

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.locomotion.soccer.boxhead import BoxHead
from dm_control_tpu.locomotion.soccer.humanoid import Humanoid
from dm_control_tpu.locomotion.soccer.pitch import (
    MINI_FOOTBALL_GOAL_SIZE, MINI_FOOTBALL_MAX_AREA_PER_HUMANOID,
    MINI_FOOTBALL_MIN_AREA_PER_HUMANOID, Pitch, RandomizedPitch,
)
from dm_control_tpu.locomotion.soccer.soccer_ball import (
    SoccerBall, regulation_soccer_ball,
)
from dm_control_tpu.locomotion.soccer.task import MultiturnTask, Task
from dm_control_tpu.locomotion.soccer.team import (
    RGBA_BLUE, RGBA_RED, Player, Team,
)
from dm_control_tpu.locomotion.walkers.ant import Ant


class WalkerType(enum.Enum):
    BOXHEAD = 0
    ANT = 1
    HUMANOID = 2


def _make_walker(name, walker_id, marker_rgba,
                 walker_type=WalkerType.BOXHEAD):
    """Construct one walker (reference soccer/__init__.py:54-77)."""
    if walker_type == WalkerType.BOXHEAD:
        return BoxHead(name=name, walker_id=walker_id,
                       marker_rgba=marker_rgba)
    if walker_type == WalkerType.ANT:
        return Ant(name=name, marker_rgba=marker_rgba)
    if walker_type == WalkerType.HUMANOID:
        return Humanoid(name=name, marker_rgba=list(marker_rgba),
                        walker_id=walker_id,
                        visual=Humanoid.Visual.JERSEY)
    raise ValueError(f"Unrecognized walker type: {walker_type}")


def _make_players(team_size, walker_type):
    """Home and away teams of `team_size` players each."""
    home, away = [], []
    for i in range(team_size):
        home.append(Player(Team.HOME, _make_walker(
            f"home{i}", i, RGBA_BLUE, walker_type)))
        away.append(Player(Team.AWAY, _make_walker(
            f"away{i}", i, RGBA_RED, walker_type)))
    return home + away


def _area_to_size(area, aspect_ratio=0.75):
    """(half-length, half-width) from area and aspect ratio."""
    return np.sqrt([area / aspect_ratio, area * aspect_ratio]) / 2.0


_WALKER_TYPE_ALIASES = {"boxhead": WalkerType.BOXHEAD,
                        "ant": WalkerType.ANT,
                        "humanoid": WalkerType.HUMANOID}


def load(team_size=2, time_limit=45.0, random_state=None,
         disable_walker_contacts=False, enable_field_box=False,
         keep_aspect_ratio=False, terminate_on_goal=True,
         walker_type=WalkerType.BOXHEAD, pitch_size=None):
    """Construct a `team_size`-vs-`team_size` soccer environment
    (reference soccer/__init__.py:92-170).

    Extension: `pitch_size` pins a fixed-size Pitch (no per-episode
    randomization/recompile) — the cheap path for batched training."""
    if isinstance(walker_type, str):
        walker_type = _WALKER_TYPE_ALIASES[walker_type.lower()]
    if not 1 <= team_size <= 11:
        raise ValueError(
            f"team_size must be between 1 and 11, got {team_size}")

    goal_size = None
    min_size, max_size = (32, 24), (48, 36)
    ball = SoccerBall()
    if walker_type == WalkerType.HUMANOID:
        goal_size = MINI_FOOTBALL_GOAL_SIZE
        num_walkers = team_size * 2
        min_size = _area_to_size(
            MINI_FOOTBALL_MIN_AREA_PER_HUMANOID * num_walkers)
        max_size = _area_to_size(
            MINI_FOOTBALL_MAX_AREA_PER_HUMANOID * num_walkers)
        ball = regulation_soccer_ball()

    if pitch_size is not None:
        arena = Pitch(size=pitch_size, goal_size=goal_size,
                      field_box=enable_field_box)
        recompile = False
    else:
        arena = RandomizedPitch(
            min_size=min_size, max_size=max_size,
            keep_aspect_ratio=keep_aspect_ratio, goal_size=goal_size,
            field_box=enable_field_box)
        recompile = True

    task_factory = Task if terminate_on_goal else MultiturnTask
    task = task_factory(
        players=_make_players(team_size, walker_type), arena=arena,
        ball=ball, disable_walker_contacts=disable_walker_contacts)
    return composer.Environment(
        task, time_limit=time_limit, random_state=random_state,
        recompile_mjcf_every_episode=recompile)


def load_batch(team_size=2, time_limit=45.0, pitch_size=(12, 9),
               disable_walker_contacts=False, dtype=None, autoreset=True):
    """N-vs-N soccer on the batched TPU path (BASELINE ladder rung 5).

    Compiles the fixed-size pitch + BoxHead players once and returns an
    ``rl.batch_env.BatchEnv`` stepping the full match under one jit
    (per-player rewards are a (n_players,) vector per env; goal scoring
    terminates the episode and autoreset re-kicks off).  The reference
    parallelizes this task with one OS process per env
    (scripts/vec_env.py:396); here thousands of games share one chip.
    """
    from dm_control_tpu.composer import batch as composer_batch

    task = Task(
        players=_make_players(team_size, WalkerType.BOXHEAD),
        arena=Pitch(size=pitch_size, field_box=enable_field_box_default()),
        ball=SoccerBall(),
        disable_walker_contacts=disable_walker_contacts)
    return composer_batch.compile_task(
        task, time_limit=time_limit, dtype=dtype, autoreset=autoreset)


def enable_field_box_default():
    """Batched envs keep the ball in play with the pitch field box."""
    return True
