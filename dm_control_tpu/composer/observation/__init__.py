"""Observation system (reference: dm_control/composer/observation/)."""

from dm_control_tpu.composer.observation.observable import (  # noqa: F401
    Generic, MJCFFeature, MujocoCamera, Observable,
)
from dm_control_tpu.composer.observation.obs_buffer import Buffer  # noqa: F401
from dm_control_tpu.composer.observation.updater import Updater  # noqa: F401
