"""Dev-time model code generator.

Converts an MJCF XML (e.g. from an installed dm_control distribution) into a
Python literal tree for `dm_control_tpu.suite.models`.  The emitted structure
is ``(tag, attrs_dict, [children])`` nested literals — model-as-code, no XML
at runtime.  Visual-only content (textures, materials, skybox, lights,
<visual>) is stripped: rendering is off-path in this framework.

Usage (dev only):
    python -m dm_control_tpu.suite._modelgen cartpole > models/cartpole.py
"""

from __future__ import annotations

import pprint
import sys

from dm_control_tpu.mjcf.element import Element
from dm_control_tpu.mjcf.parser import from_xml_string

# Elements that only affect rendering.
_DROP_TAGS = {"light", "texture", "material", "skin", "visual"}
# Attributes that only affect rendering.
_DROP_ATTRS = {"material", "rgba"}
_KEEP_RGBA = False


def _strip(elem: Element):
    if elem.tag in _DROP_TAGS:
        return None
    attrs = {k: v for k, v in elem.attrib.items()
             if k not in _DROP_ATTRS}
    children = []
    for c in elem.children:
        sc = _strip(c)
        if sc is not None:
            children.append(sc)
    # drop now-empty container sections
    if elem.tag == "asset" and not children:
        return None
    return (elem.tag, attrs, children)


def to_literal(xml: str, assets=None):
    root = from_xml_string(xml, assets=assets)
    return _strip(root)


def to_element(lit) -> Element:
    """Runtime loader: literal tree → Element tree."""
    tag, attrs, children = lit
    e = Element(tag, dict(attrs))
    for c in children:
        child = to_element(c)
        child.parent = e
        e.children.append(child)
    return e


def emit_module(name: str, xml: str, assets=None) -> str:
    lit = to_literal(xml, assets=assets)
    body = pprint.pformat(lit, width=78, indent=1, sort_dicts=False)
    return (
        f'"""Model definition for the {name} domain (generated literal tree).\n'
        f'\nPhysical parameters match the reference dm_control suite model\n'
        f'(reference: dm_control/suite/{name}.xml); visual-only elements are\n'
        f'omitted.  Regenerate with dm_control_tpu/suite/_modelgen.py.\n"""\n'
        f"\n# fmt: off\nMODEL = \\\n{body}\n# fmt: on\n"
    )


def main():
    from dm_control.suite import common  # dev-time only

    name = sys.argv[1]
    xml = common.read_model(name + ".xml")
    sys.stdout.write(emit_module(name, xml, assets=dict(common.ASSETS)))


if __name__ == "__main__":
    main()
