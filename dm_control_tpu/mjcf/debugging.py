"""MJCF debugging: track where elements were created and dump annotated
XML.

Reference: dm_control/mjcf/debugging.py — when enabled, records the
Python stack at element creation/modification so compile errors point at
the responsible builder code, and can inject those origins as XML
comments in a full dump.
"""

from __future__ import annotations

import os
import traceback
from typing import Dict, Optional

_ENABLED = False
_ORIGINS: Dict[int, str] = {}


def debug_mode_enabled() -> bool:
    return _ENABLED


def enable_debug_mode(enabled: bool = True) -> None:
    """Turns creation-site tracking on (reference --pymjcf_debug)."""
    global _ENABLED
    _ENABLED = enabled
    if not enabled:
        _ORIGINS.clear()


def record_origin(element) -> None:
    """Called by Element construction when debug mode is on."""
    if not _ENABLED:
        return
    stack = traceback.extract_stack()
    for frame in reversed(stack):
        if "dm_control_tpu/mjcf" not in frame.filename.replace(os.sep, "/"):
            _ORIGINS[id(element)] = f"{frame.filename}:{frame.lineno}"
            return


def origin_of(element) -> Optional[str]:
    return _ORIGINS.get(id(element))


def dump_model(root, path: str) -> str:
    """Writes the model XML with `<!-- created at ... -->` annotations
    for every tracked element (reference debugging full-dump)."""

    def serialize(e, indent=0):
        pad = "  " * indent
        origin = origin_of(e)
        lines = []
        if origin:
            lines.append(f"{pad}<!-- created at {origin} -->")
        attrs = " ".join(f'{k}="{v}"' for k, v in e.attrib.items()
                         if v is not None)
        if e.children:
            lines.append(f"{pad}<{e.tag}{' ' + attrs if attrs else ''}>")
            for c in e.children:
                lines.extend(serialize(c, indent + 1))
            lines.append(f"{pad}</{e.tag}>")
        else:
            lines.append(f"{pad}<{e.tag}{' ' + attrs if attrs else ''}/>")
        return lines

    text = "\n".join(serialize(root)) + "\n"
    with open(path, "w") as f:
        f.write(text)
    return path
