"""A lightweight MJCF element tree (DOM).

The reference's PyMJCF builds a schema-validated DOM with attachment and
binding (dm_control/mjcf/element.py).  This module provides the core DOM
used by both the XML parser and programmatic model builders; schema-level
validation lives in the compiler, which knows the semantics of each field.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional


class Element:
    """An MJCF element: tag, attributes, ordered children."""

    # ``payload``: optional in-memory asset bytes for file-referencing
    # elements (mesh/hfield/texture), used by export_with_assets
    __slots__ = ("tag", "attrib", "children", "parent", "payload")

    def __init__(self, tag: str, attrib: Optional[Dict[str, object]] = None,
                 parent: Optional["Element"] = None):
        self.tag = tag
        self.attrib: Dict[str, object] = dict(attrib or {})
        self.children: List[Element] = []
        self.parent = parent
        from dm_control_tpu.mjcf import debugging

        if debugging.debug_mode_enabled():
            debugging.record_origin(self)

    # -- construction -------------------------------------------------------

    def add(self, tag: str, **attrib) -> "Element":
        """Appends and returns a new child element (PyMJCF ``Element.add``)."""
        child = Element(tag, attrib, parent=self)
        self.children.append(child)
        return child

    def remove(self, child: "Element") -> None:
        self.children.remove(child)
        child.parent = None

    # -- queries ------------------------------------------------------------

    def get(self, key: str, default=None):
        return self.attrib.get(key, default)

    @property
    def name(self) -> Optional[str]:
        return self.attrib.get("name")

    def find_all(self, tag: str) -> List["Element"]:
        """All descendants with the given tag, in document order."""
        out = []
        for c in self.iter():
            if c.tag == tag:
                out.append(c)
        return out

    def find(self, tag: str, name: str) -> Optional["Element"]:
        for c in self.find_all(tag):
            if c.attrib.get("name") == name:
                return c
        return None

    def first(self, tag: str) -> Optional["Element"]:
        for c in self.children:
            if c.tag == tag:
                return c
        return None

    def iter(self) -> Iterator["Element"]:
        """Depth-first iteration including self."""
        yield self
        for c in self.children:
            yield from c.iter()

    # -- serialization ------------------------------------------------------

    def to_xml_string(self, indent: int = 0) -> str:
        """Serializes back to MJCF XML (for debugging and oracle tests)."""
        pad = "  " * indent
        attrs = " ".join(
            f'{k}="{_fmt(v)}"' for k, v in self.attrib.items() if v is not None
        )
        open_tag = f"{pad}<{self.tag}{(' ' + attrs) if attrs else ''}"
        if not self.children:
            return open_tag + "/>"
        lines = [open_tag + ">"]
        for c in self.children:
            lines.append(c.to_xml_string(indent + 1))
        lines.append(f"{pad}</{self.tag}>")
        return "\n".join(lines)

    def __repr__(self):
        return f"<Element {self.tag} {self.attrib}>"


def _fmt(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return " ".join(_fmt(x) for x in v)
    if isinstance(v, float):
        return repr(v)
    return str(v)
