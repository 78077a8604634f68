"""Multi-agent soccer (reference: dm_control/locomotion/soccer/)."""

from dm_control_tpu.locomotion.soccer.boxhead import BoxHead  # noqa: F401
from dm_control_tpu.locomotion.soccer.pitch import Pitch  # noqa: F401
from dm_control_tpu.locomotion.soccer.soccer_ball import SoccerBall  # noqa: F401
from dm_control_tpu.locomotion.soccer.task import Task  # noqa: F401
from dm_control_tpu.locomotion.soccer.loader import load  # noqa: F401
