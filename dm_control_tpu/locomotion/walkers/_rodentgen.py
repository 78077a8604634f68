"""Dev-time generator for the rodent model literal
(locomotion/models/rodent.py).

The reference Rat (dm_control/locomotion/walkers/rodent.py:60, assets/
rodent.xml) is a 67KB MJCF of PRIMITIVE geoms — capsule collision
classes, bone-class visual primitives, tendon-coupled vertebral columns,
muscle-style general actuators, touch/gyro/accelerometer sensors.  Its
only mesh-adjacent element is the ``.skn`` skin, which is rendering-only
(skinned vertices over the same primitive bodies).

This script transcribes the full model through the same pipeline as the
suite domains (suite/_modelgen.to_literal), dropping only the skin and
its asset entry, so the compiled Model's sizes match the oracle's
mjModel (asserted by tests/test_rodent_fidelity.py).

Usage (dev only):
    python -m dm_control_tpu.locomotion.walkers._rodentgen \
        > dm_control_tpu/locomotion/models/rodent.py
"""

from __future__ import annotations

import pprint
import sys


def build_literal():
    import os

    import dm_control.locomotion.walkers.rodent as oracle_rodent

    from dm_control_tpu.suite import _modelgen

    xml_path = oracle_rodent._XML_PATH
    with open(xml_path) as f:
        xml = f.read()
    base_dir = os.path.dirname(xml_path)
    lit = _modelgen.to_literal(xml)

    def transform(node):
        tag, attrs, children = node
        if tag == "skin":
            return None  # rendering-only skinned surface
        if tag == "compiler" and attrs.get("meshdir"):
            attrs = {k: v for k, v in attrs.items() if k != "meshdir"}
        new_children = []
        for c in children:
            tc = transform(c)
            if tc is not None:
                new_children.append(tc)
        if tag == "asset" and not new_children:
            return None
        return (tag, dict(attrs), new_children)

    return transform(lit)


def main():
    lit = build_literal()
    body = pprint.pformat(lit, width=78, indent=1, sort_dicts=False)
    sys.stdout.write(
        '"""Rodent walker model (generated literal tree).\n'
        "\nFull transcription of the reference rat MJCF\n"
        "(dm_control/locomotion/walkers/assets/rodent.xml) — primitive\n"
        "collision capsules, bone-class visual primitives, vertebral\n"
        "tendon columns, general actuators and sensors.  Only the\n"
        "rendering-only .skn skin is dropped.  Regenerate with\n"
        "dm_control_tpu/locomotion/walkers/_rodentgen.py.\n"
        '"""\n'
        f"\n# fmt: off\nMODEL = \\\n{body}\n# fmt: on\n"
    )


if __name__ == "__main__":
    main()
