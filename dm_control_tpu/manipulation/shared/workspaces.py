"""Workspace sampling helpers
(reference: dm_control/manipulation/shared/workspaces.py)."""

from __future__ import annotations

import collections

import numpy as np

BoundingBox = collections.namedtuple("BoundingBox", ["lower", "upper"])


def uniform_in_box(box: BoundingBox, random_state) -> np.ndarray:
    return random_state.uniform(np.asarray(box.lower),
                                np.asarray(box.upper))


def add_bbox_site(root, box: BoundingBox, name="workspace", rgba=None):
    """Adds a visualization site for the workspace (group 4, inert)."""
    lower = np.asarray(box.lower, float)
    upper = np.asarray(box.upper, float)
    center = (lower + upper) / 2
    half = np.maximum((upper - lower) / 2, 1e-4)
    wb = root.first("worldbody")
    return wb.add("site", name=name, type="box",
                  pos=" ".join(map(str, center)),
                  size=" ".join(map(str, half)), group="4")
