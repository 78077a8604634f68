"""Angle-unit normalization for MJCF element trees.

MJCF interprets every angle-valued attribute through ONE compiler-level
``angle`` setting (degree by default).  When two trees with different
settings are merged by :func:`attach_model`, the child's angle values
would silently be re-interpreted in the root's unit — e.g. a
radian-authored walker attached under a degree arena gets its joint
ranges crushed 57x (found live on the Kinova Jaco / CMU walkers in
round 5).  The reference never hits this because PyMJCF canonicalizes
every tree to radians at parse time (dm_control/mjcf/schema.xml declares
the angle-typed attributes); here the same canonicalization runs once
per tree, on attach.

The set of converted attributes mirrors exactly what this package's
compiler passes through ``_ang``: ``euler`` (all orientation carriers),
``axisangle`` (4th component), and hinge/ball joint ``range`` / ``ref``
/ ``springref`` / ``margin``.
"""

from __future__ import annotations

import math

from dm_control_tpu.mjcf.element import Element

_DEG2RAD = math.pi / 180.0


def _scaled(value, scale, which=None):
    """Rescales a whitespace float list; ``which`` selects components."""
    parts = str(value).split()
    out = []
    for i, p in enumerate(parts):
        if which is None or i in which:
            out.append(f"{float(p) * scale:.17g}")
        else:
            out.append(p)
    return " ".join(out)


def _joint_type_map(root: Element):
    """class name -> joint type, resolved through nested default
    inheritance (a nested class inherits its parent's joint type unless
    it sets one)."""
    out = {}

    def walk(elem, cls, inherited):
        jtype = inherited
        for ch in elem.children:
            if ch.tag == "joint" and ch.get("type") is not None:
                jtype = str(ch.get("type"))
        out[cls] = jtype
        for ch in elem.children:
            if ch.tag == "default":
                walk(ch, ch.get("class", cls), jtype)

    for d in root.children:
        if d.tag == "default":
            walk(d, d.get("class"), None)
    return out


def _resolve_joint_type(elem: Element, childclass, jtypes):
    if elem.get("type") is not None:
        return str(elem.get("type"))
    cls = elem.get("class", childclass)
    t = jtypes.get(cls)
    if t is None and cls is not None:
        t = jtypes.get(None)
    return t if t is not None else "hinge"


def to_radians(root: Element) -> None:
    """Converts a degree-unit tree to radians IN PLACE and stamps
    ``<compiler angle="radian">``.  Radian trees are returned unchanged
    (idempotent)."""
    comp = root.first("compiler")
    if comp is not None and comp.get("angle", "degree") == "radian":
        return
    if comp is None:
        comp = root.add("compiler")
    comp.attrib["angle"] = "radian"

    jtypes = _joint_type_map(root)

    def convert_elem(elem, childclass):
        if elem.get("euler") is not None:
            elem.attrib["euler"] = _scaled(elem.attrib["euler"], _DEG2RAD)
        if elem.get("axisangle") is not None:
            elem.attrib["axisangle"] = _scaled(
                elem.attrib["axisangle"], _DEG2RAD, which={3})
        if elem.tag == "joint":
            jt = _resolve_joint_type(elem, childclass, jtypes)
            if jt in ("hinge", "ball"):
                for attr in ("range", "ref", "springref", "margin"):
                    if elem.get(attr) is not None:
                        elem.attrib[attr] = _scaled(
                            elem.attrib[attr], _DEG2RAD)

    def walk(elem, childclass, default_cls):
        if elem.tag == "body":
            childclass = elem.get("childclass", childclass)
        if elem.tag == "default":
            # inside defaults the joint "type" lookup is the class itself
            default_cls = elem.get("class", default_cls)
            childclass = default_cls
        convert_elem(elem, childclass)
        for ch in elem.children:
            walk(ch, childclass, default_cls)

    walk(root, None, None)
