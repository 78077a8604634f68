"""Clip-dataset registry (reference: tasks/reference_pose/datasets.py +
cmu_subsets.py).

The reference ships 1,289 lines of hard-coded CMU clip-id lists; here the
registry is programmatic: named subsets are predicates over a loader's
available clip ids, so the same subset names work for the real CMU h5
(when present via $CMU_MOCAP_DIR) and for synthetic banks.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

from dm_control_tpu.locomotion.mocap.types import ClipCollection

# canonical CMU subset names (reference cmu_subsets.py CMU_SUBSETS_DICT)
_SUBSET_PREDICATES: Dict[str, Callable[[str], bool]] = {}
_REGISTERED: Dict[str, ClipCollection] = {}


def register_subset(name: str,
                    predicate: Optional[Callable[[str], bool]] = None,
                    ids: Optional[Sequence[str]] = None) -> None:
    """Registers a named subset either as explicit clip ids or as a
    predicate evaluated against a loader's keys."""
    if (predicate is None) == (ids is None):
        raise ValueError("Provide exactly one of predicate or ids.")
    if ids is not None:
        _REGISTERED[name] = ClipCollection(ids=tuple(ids))
    else:
        _SUBSET_PREDICATES[name] = predicate


def get_dataset(name: str, loader=None) -> ClipCollection:
    """Resolves a registered dataset name into a ClipCollection
    (reference datasets.py DATASETS registry)."""
    if name in _REGISTERED:
        return _REGISTERED[name]
    if name in _SUBSET_PREDICATES:
        if loader is None:
            raise ValueError(
                f"Subset {name!r} is predicate-based: pass the loader "
                f"whose clips it filters.")
        ids = tuple(k for k in loader.keys()
                    if _SUBSET_PREDICATES[name](k))
        if not ids:
            raise ValueError(
                f"Subset {name!r} matched no clips in the loader.")
        return ClipCollection(ids=ids)
    raise KeyError(
        f"Unknown dataset {name!r}; registered: "
        f"{sorted(set(_REGISTERED) | set(_SUBSET_PREDICATES))}")


def names() -> Sequence[str]:
    return sorted(set(_REGISTERED) | set(_SUBSET_PREDICATES))


# The reference's canonical subset names.  With the real CMU dataset the
# ids follow the 'CMU_###_##' scheme; the predicates keep those names
# resolvable against any loader (incl. synthetic test banks).
register_subset("all", predicate=lambda cid: True)
register_subset("walk_tiny", predicate=lambda cid: "walk" in cid.lower())
register_subset("run_jump_tiny",
                predicate=lambda cid: any(k in cid.lower()
                                          for k in ("run", "jump")))
register_subset("get_up", predicate=lambda cid: "get_up" in cid.lower())
register_subset("locomotion_small",
                predicate=lambda cid: any(k in cid.lower()
                                          for k in ("walk", "run", "jump",
                                                    "turn")))
