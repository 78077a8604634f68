"""Locomotion tasks (reference: dm_control/locomotion/tasks/)."""

from dm_control_tpu.locomotion.tasks.corridors import RunThroughCorridor  # noqa: F401
from dm_control_tpu.locomotion.tasks.go_to_target import GoToTarget  # noqa: F401
