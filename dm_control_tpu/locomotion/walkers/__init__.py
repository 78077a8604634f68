"""Locomotion walkers (reference: dm_control/locomotion/walkers/)."""

from dm_control_tpu.locomotion.walkers.ant import Ant  # noqa: F401
from dm_control_tpu.locomotion.walkers.cmu_humanoid import (  # noqa: F401
    CMUHumanoid, CMUHumanoidPositionControlled,
)
from dm_control_tpu.locomotion.walkers.jumping_ball import (  # noqa: F401
    JumpingBallWithHead, RollingBallWithHead,
)
from dm_control_tpu.locomotion.walkers.rodent import Rat  # noqa: F401
from dm_control_tpu.locomotion.walkers import rescale  # noqa: F401
from dm_control_tpu.locomotion.walkers import scaled_actuators  # noqa: F401
