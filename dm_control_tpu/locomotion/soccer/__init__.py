"""Multi-agent soccer (reference: dm_control/locomotion/soccer/)."""

from dm_control_tpu.locomotion.soccer.boxhead import BoxHead  # noqa: F401
from dm_control_tpu.locomotion.soccer.camera import (  # noqa: F401
    MultiplayerTrackingCamera,
)
from dm_control_tpu.locomotion.soccer.humanoid import Humanoid  # noqa: F401
from dm_control_tpu.locomotion.soccer.initializers import (  # noqa: F401
    Initializer, UniformInitializer,
)
from dm_control_tpu.locomotion.soccer.loader import (  # noqa: F401
    WalkerType, load, load_batch,
)
from dm_control_tpu.locomotion.soccer.observables import (  # noqa: F401
    CoreObservablesAdder, InterceptionObservablesAdder,
    MultiObservablesAdder, ObservablesAdder,
)
from dm_control_tpu.locomotion.soccer.pitch import (  # noqa: F401
    MINI_FOOTBALL_GOAL_SIZE, MINI_FOOTBALL_MAX_AREA_PER_HUMANOID,
    MINI_FOOTBALL_MIN_AREA_PER_HUMANOID, Pitch, RandomizedPitch,
)
from dm_control_tpu.locomotion.soccer.soccer_ball import (  # noqa: F401
    SoccerBall, regulation_soccer_ball,
)
from dm_control_tpu.locomotion.soccer.task import (  # noqa: F401
    MultiturnTask, Task,
)
from dm_control_tpu.locomotion.soccer.team import (  # noqa: F401
    RGBA_BLUE, RGBA_RED, Player, Team,
)
