"""Dev-time generator for the Kinova Jaco model literals
(entities/manipulators/kinova_models.py).

The reference Jaco (dm_control/entities/manipulators/kinova/jaco_arm.py
:50, third_party/kinova/jaco_arm.xml + jaco_hand.xml) compiles STL link
meshes.  TPU-first recast, same as the suite dog (_doggen.py): meshes
are a compile-time concept — each mesh geom's mass model is baked into
an explicit ``<inertial>`` on its body (values from the oracle-compiled
installed dm_control model, whose distribution ships the STLs), and the
mesh's CONTACT role is taken over by a box proxy fitted to the oracle's
mesh bounding box (same contype/conaffinity/condim/friction), so the
runtime model is mesh-free.

Usage (dev only):
    python -m dm_control_tpu.entities.manipulators._jacogen \
        > dm_control_tpu/entities/manipulators/kinova_models.py
"""

from __future__ import annotations

import os
import pprint
import sys

import numpy as np


def _fmt(a) -> str:
    return " ".join(repr(float(x)) for x in np.asarray(a).ravel())


def build_literal(xml_name: str):
    import mujoco

    from dm_control_tpu.suite import _modelgen

    kinova_root = os.path.join(
        os.path.dirname(os.path.dirname(mujoco.__file__)),
        "dm_control", "third_party", "kinova")
    path = os.path.join(kinova_root, xml_name)
    with open(path) as f:
        xml = f.read()
    mm = mujoco.MjModel.from_xml_path(path)

    # resolve <include common.xml> by hand (the literal must be
    # self-contained)
    with open(os.path.join(kinova_root, "common.xml")) as f:
        common = f.read()
    # keep the include as a placeholder tag for the splice below
    xml = xml.replace('<include file="common.xml"/>',
                      "<__common__/>")
    lit = _modelgen.to_literal(xml)
    common_lit = _modelgen.to_literal(common)

    body_vals = {}
    for b in range(1, mm.nbody):
        body_vals[mm.body(b).name] = dict(
            pos=_fmt(mm.body_ipos[b]), quat=_fmt(mm.body_iquat[b]),
            mass=repr(float(mm.body_mass[b])),
            diaginertia=_fmt(mm.body_inertia[b]),
        )

    # oracle per-geom frames + mesh AABBs for collision proxies
    geom_info = {}
    for g in range(mm.ngeom):
        name = mm.geom(g).name
        if not name:
            continue
        geom_info[name] = dict(
            is_mesh=int(mm.geom_type[g]) == int(mujoco.mjtGeom.mjGEOM_MESH),
            pos=np.array(mm.geom_pos[g]), quat=np.array(mm.geom_quat[g]),
            aabb=np.array(mm.geom_aabb[g]),  # (center3, halfsize3)
            condim=int(mm.geom_condim[g]),
            contype=int(mm.geom_contype[g]),
            conaffinity=int(mm.geom_conaffinity[g]),
            friction=np.array(mm.geom_friction[g]),
        )

    def transform(node):
        tag, attrs, children = node
        if tag == "__common__":
            return ("__common__", {}, [])
        if tag == "mesh":
            return None
        if tag == "inertial":
            return None
        if tag == "geom":
            name = attrs.get("name")
            info = geom_info.get(name) if name else None
            mesh_ref = "mesh" in attrs or (info and info["is_mesh"])
            if mesh_ref:
                if info is None or not np.any(info["aabb"][3:] > 0):
                    return None
                # box proxy at the mesh's oracle AABB (geom frame)
                from dm_control_tpu.utils import transformations as tr

                center = info["pos"] + np.asarray(
                    tr.quat_rotate(info["quat"], info["aabb"][:3]))
                new = {
                    "name": name, "type": "box",
                    "pos": _fmt(center), "quat": _fmt(info["quat"]),
                    "size": _fmt(np.maximum(info["aabb"][3:], 1e-4)),
                    "mass": "0",
                    "condim": str(info["condim"]),
                    "contype": str(info["contype"]),
                    "conaffinity": str(info["conaffinity"]),
                    "friction": _fmt(info["friction"]),
                    "rgba": "0.35 0.35 0.38 1",
                }
                return ("geom", new, [])
        new_children = []
        for c in children:
            tc = transform(c)
            if tc is not None:
                new_children.append(tc)
        if tag == "body":
            vals = body_vals.get(attrs.get("name"))
            if vals:
                new_children.insert(0, ("inertial", dict(vals), []))
        if tag == "asset" and not new_children:
            return None
        if tag == "compiler":
            attrs = {k: v for k, v in attrs.items() if k != "meshdir"}
        return (tag, dict(attrs), new_children)

    out = transform(lit)
    # splice common.xml sections (visual/material assets) -> keep only
    # the asset materials the geoms reference
    tag, attrs, children = out
    spliced = []
    for c in children:
        if c[0] == "__common__":
            for cc in common_lit[2]:
                if cc[0] in ("asset", "default"):
                    spliced.append(cc)
        else:
            spliced.append(c)
    return (tag, attrs, spliced), mm


def main():
    arm, _ = build_literal("jaco_arm.xml")
    hand, _ = build_literal("jaco_hand.xml")
    sys.stdout.write(
        '"""Kinova Jaco arm/hand model literals (generated).\n'
        "\nPhysical parameters match the reference\n"
        "(dm_control/third_party/kinova/jaco_arm.xml + jaco_hand.xml):\n"
        "mesh mass models are baked into explicit <inertial> elements and\n"
        "mesh contacts are served by oracle-AABB box proxies (values from\n"
        "the oracle-compiled installed dm_control model).  Regenerate with\n"
        "dm_control_tpu/entities/manipulators/_jacogen.py.\n"
        '"""\n'
        "\n# fmt: off\nARM_MODEL = \\\n"
        + pprint.pformat(arm, width=78, indent=1, sort_dicts=False)
        + "\n\nHAND_MODEL = \\\n"
        + pprint.pformat(hand, width=78, indent=1, sort_dicts=False)
        + "\n# fmt: on\n")


if __name__ == "__main__":
    main()
