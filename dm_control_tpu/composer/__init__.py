"""Composer: entity-based task composition framework.

Reimplements the reference's composer (dm_control/composer/) with a
TPU-first stance: entities build MJCF element trees that are merged and
compiled **once** per environment (ahead-of-time), replacing the
reference's per-episode model recompilation
(composer/environment.py:227-232) with array-leaf *parameter variation* —
morphology is fixed per jit cache entry, numbers vary freely.
"""

from dm_control_tpu.composer.define import cached_property, observable  # noqa: F401
from dm_control_tpu.composer.entity import Entity, ModelWrapperEntity, Observables  # noqa: F401
from dm_control_tpu.composer.arena import Arena  # noqa: F401
from dm_control_tpu.composer.task import NullTask, Task  # noqa: F401
from dm_control_tpu.composer.environment import Environment  # noqa: F401
