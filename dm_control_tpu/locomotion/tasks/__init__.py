"""Locomotion tasks (reference: dm_control/locomotion/tasks/)."""

from dm_control_tpu.locomotion.tasks.corridors import RunThroughCorridor  # noqa: F401
from dm_control_tpu.locomotion.tasks.go_to_target import GoToTarget  # noqa: F401
from dm_control_tpu.locomotion.tasks.escape import Escape  # noqa: F401
from dm_control_tpu.locomotion.tasks.random_goal_maze import (  # noqa: F401
    ManyGoalsMaze, ManyHeterogeneousGoalsMaze, NullGoalMaze,
    RepeatSingleGoalMaze, RepeatSingleGoalMazeAugmentedWithTargets,
)
from dm_control_tpu.locomotion.tasks.reach import TwoTouch  # noqa: F401
