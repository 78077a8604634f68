"""Clip-dataset registry (reference: tasks/reference_pose/datasets.py).

``DATASETS`` maps subset names to explicit :class:`ClipCollection` id
lists, exactly as the reference does: the canonical CMU subsets
(walk_tiny, run_jump_tiny, get_up, locomotion_small, all) name the same
opaque 'CMU_###_##' clip ids as the reference's curated registry
(cmu_subsets.py, regenerated here by _cmu_subsets_gen.py).  Additional
named subsets can be registered at runtime.
"""

from __future__ import annotations

from typing import Dict, Sequence

from dm_control_tpu.locomotion.mocap.types import ClipCollection
from dm_control_tpu.locomotion.tasks.reference_pose import cmu_subsets

DATASETS: Dict[str, ClipCollection] = dict(cmu_subsets.CMU_SUBSETS_DICT)


def register_subset(name: str, ids: Sequence[str]) -> None:
    """Registers a named subset as an explicit clip-id list."""
    DATASETS[name] = ClipCollection(ids=tuple(ids))


def get_dataset(name: str, loader=None) -> ClipCollection:
    """Resolves a registered dataset name into a ClipCollection.

    With ``loader``, the returned collection is restricted to the clips
    the loader actually has — and it is an error if the intersection is
    empty (a registry/dataset mismatch, e.g. synthetic bank keys against
    the CMU subset names).
    """
    try:
        collection = DATASETS[name]
    except KeyError:
        raise KeyError(f"Unknown dataset {name!r}; registered: "
                       f"{sorted(DATASETS)}") from None
    if loader is None:
        return collection
    have = set(loader.keys())
    ids = tuple(cid for cid in collection.ids if cid in have)
    if not ids:
        raise ValueError(
            f"Dataset {name!r} shares no clip ids with the loader "
            f"(registry ids like {collection.ids[:2]}, loader keys like "
            f"{sorted(have)[:2]}).")
    return ClipCollection(ids=ids)


def available(loader) -> ClipCollection:
    """Everything a loader ships, as a collection (for synthetic banks
    whose keys are not CMU database ids)."""
    return ClipCollection(ids=tuple(loader.keys()))


def names() -> Sequence[str]:
    return sorted(DATASETS)
