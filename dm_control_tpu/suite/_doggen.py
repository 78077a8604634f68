"""Dev-time generator for the dog model literal (models/dog.py).

The reference dog domain (dm_control/suite/dog.py:1, dog.xml) builds its
mass model from 162 STL bone meshes compiled by MuJoCo's native mesh
pipeline; the meshes themselves never collide (class "bone" sets
contype="0" conaffinity="0" — dog.xml:14) and all contacts go through
primitive capsules/spheres/boxes (class "collision_primitive").

TPU-first recast: meshes are a *compile-time* concept only.  This script
bakes the mesh-derived inertia of every body into an explicit
``<inertial>`` element (values read from the oracle-compiled mjModel of
the installed dm_control package, which ships the STL assets) and drops
the mesh geoms and assets entirely, so the runtime model is mesh-free and
the device program identical in structure to every other suite domain.

Usage (dev only):
    python -m dm_control_tpu.suite._doggen > dm_control_tpu/suite/models/dog.py
"""

from __future__ import annotations

import pprint
import sys

import numpy as np


def _fmt_floats(a) -> str:
    return " ".join(repr(float(x)) for x in np.asarray(a).ravel())


def build_literal():
    import mujoco
    from dm_control.suite import dog as odog  # dev-time oracle

    from dm_control_tpu.suite import _modelgen

    xml, assets = odog.get_model_and_assets(floor_size=10, remove_ball=False)
    xml = xml.decode() if isinstance(xml, bytes) else xml
    mm = mujoco.MjModel.from_xml_string(xml, assets)

    lit = _modelgen.to_literal(xml, assets=assets)

    body_vals = {}
    for b in range(1, mm.nbody):
        name = mm.body(b).name
        body_vals[name] = dict(
            pos=_fmt_floats(mm.body_ipos[b]),
            quat=_fmt_floats(mm.body_iquat[b]),
            mass=repr(float(mm.body_mass[b])),
            diaginertia=_fmt_floats(mm.body_inertia[b]),
        )

    def transform(node):
        tag, attrs, children = node
        if tag == "mesh":
            return None
        if tag == "geom" and "mesh" in attrs:
            return None  # bone/muscle visuals: mass now lives in <inertial>
        if tag == "inertial":
            return None  # replaced by the oracle-derived values below
        new_children = []
        for c in children:
            tc = transform(c)
            if tc is not None:
                new_children.append(tc)
        if tag == "body":
            vals = body_vals[attrs["name"]]
            new_children.insert(0, ("inertial", dict(vals), []))
        if tag == "asset" and not new_children:
            return None
        # default classes for dropped mesh geoms are harmless to keep
        return (tag, dict(attrs), new_children)

    out = transform(lit)
    return out, mm


def main():
    lit, mm = build_literal()
    body = pprint.pformat(lit, width=78, indent=1, sort_dicts=False)
    sys.stdout.write(
        '"""Model definition for the dog domain (generated literal tree).\n'
        "\nPhysical parameters match the reference dm_control suite model\n"
        "(reference: dm_control/suite/dog.xml); mesh geoms/assets are\n"
        "dropped and their mass model is baked into explicit <inertial>\n"
        "elements (values from the oracle-compiled installed dm_control\n"
        "model, whose distribution ships the STL assets; the meshes never\n"
        "collide — dog.xml class 'bone' sets contype=conaffinity=0).\n"
        "Regenerate with dm_control_tpu/suite/_doggen.py.\n"
        '"""\n'
        f"\n# fmt: off\nMODEL = \\\n{body}\n# fmt: on\n"
    )


if __name__ == "__main__":
    main()
