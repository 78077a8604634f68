"""Shared helpers for suite domain modules."""

from __future__ import annotations

import functools

from dm_control_tpu.mjcf.compiler import compile_model
from dm_control_tpu.suite._modelgen import to_element


@functools.lru_cache(maxsize=None)
def _compile_cached(model_literal_id, builder):
    return builder()


def compile_domain_model(model_literal, mutate=None, cache_key=None):
    """Compiles a model literal tree (optionally mutated) into a Model.

    ``mutate``: optional fn(Element) applied before compilation (procedural
    domains).  Results are cached per (literal identity, cache_key).
    """
    key = (id(model_literal), cache_key)
    if key not in _MODEL_CACHE:
        root = to_element(model_literal)
        if mutate is not None:
            mutate(root)
        _MODEL_CACHE[key] = compile_model(root)
    return _MODEL_CACHE[key]


_MODEL_CACHE = {}
