"""Manipulation task registry
(reference: dm_control/manipulation/shared/registry.py:37 + tags)."""

from __future__ import annotations

from dm_control_tpu.utils import containers


class tags:  # noqa: N801 (reference API name)
    FEATURES = "features"
    VISION = "vision"
    EASY = "easy"


_REGISTRY = containers.TaggedTasks(allow_overriding_keys=False)
_done = False

add = _REGISTRY.add


def done_importing_tasks():
    global _done
    _done = True


def get_all_names():
    return tuple(_REGISTRY)


def get_tags():
    return tuple(_REGISTRY.tags())


def get_names_by_tag(tag):
    return tuple(_REGISTRY.tagged(tag))


def get(name):
    return _REGISTRY[name]
