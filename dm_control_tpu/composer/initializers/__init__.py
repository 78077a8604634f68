"""Episode initializers (reference: dm_control/composer/initializers/)."""

from dm_control_tpu.composer.initializers.prop_initializer import PropPlacer  # noqa: F401
from dm_control_tpu.composer.initializers.tcp_initializer import ToolCenterPointInitializer  # noqa: F401
