"""Locomotion arenas (reference: dm_control/locomotion/arenas/)."""

from dm_control_tpu.locomotion.arenas.floors import Floor  # noqa: F401
from dm_control_tpu.locomotion.arenas.corridors import (  # noqa: F401
    EmptyCorridor, GapsCorridor, WallsCorridor,
)
from dm_control_tpu.locomotion.arenas.bowl import Bowl  # noqa: F401
from dm_control_tpu.locomotion.arenas.mazes import (  # noqa: F401
    MazeWithTargets, TextMaze,
)
from dm_control_tpu.locomotion.arenas import covering  # noqa: F401
