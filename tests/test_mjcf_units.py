"""Angle-unit canonicalization on attach (mjcf/units.py).

Round-5 regression: a radian-authored child attached under a
degree-default root must keep its joint ranges / orientations (they were
being re-interpreted as degrees, crushing them 57x on the Kinova Jaco
and CMU walkers)."""

import math

import numpy as np

from dm_control_tpu.mjcf.attachment import attach_model
from dm_control_tpu.mjcf.element import Element
from dm_control_tpu.mjcf.units import to_radians
from dm_control_tpu.physics.physics import Physics


def _radian_walker():
    root = Element("mujoco", {"model": "walker"})
    root.add("compiler", angle="radian")
    dflt = root.add("default")
    dflt.add("joint", type="hinge", damping="0.1")
    wb = root.add("worldbody")
    body = wb.add("body", name="torso", pos="0 0 1")
    body.add("joint", name="hip", axis="0 1 0", limited="true",
             range="0.5 2.5", ref="1.0")
    body.add("geom", name="g", type="sphere", size="0.1", mass="1",
             euler="0 0 1.5707963")
    return root


def _degree_arena():
    root = Element("mujoco", {"model": "arena"})
    wb = root.add("worldbody")
    wb.add("geom", name="floor", type="plane", size="5 5 .1")
    wb.add("geom", name="ramp", type="box", size="1 1 .1", pos="2 0 0",
           euler="0 0 90")
    return root


def test_attach_preserves_radian_child_ranges():
    arena = _degree_arena()
    attach_model(arena, _radian_walker(), "walker/")
    physics = Physics.from_mjcf_model(arena)
    m = physics.model
    jid = m.names.joint["walker/hip"]
    np.testing.assert_allclose(np.asarray(m.jnt_range)[jid], [0.5, 2.5],
                               rtol=1e-6)
    # the degree-authored arena euler keeps its meaning too:
    # 90 deg about z maps the x-axis onto y
    physics.forward()
    xmat = np.asarray(physics.named_field("geom_xmat", "ramp"))
    np.testing.assert_allclose(xmat.reshape(3, 3)[:, 0], [0, 1, 0],
                               atol=1e-6)


def test_to_radians_idempotent_and_default_class_aware():
    root = Element("mujoco", {"model": "m"})
    dflt = root.add("default")
    dflt.add("joint", type="hinge")
    sub = Element("default", {"class": "slider"}, parent=dflt)
    dflt.children.append(sub)
    sub.add("joint", type="slide", range="-1 1")
    wb = root.add("worldbody")
    b = wb.add("body", name="b", pos="0 0 1")
    b.add("joint", name="h", range="-90 90")
    b.add("joint", name="s", **{"class": "slider"}, range="-2 2")
    b.add("geom", type="sphere", size=".1", mass="1")

    to_radians(root)
    assert root.first("compiler").get("angle") == "radian"
    h = root.find("joint", "h")
    lo, hi = [float(x) for x in str(h.get("range")).split()]
    assert math.isclose(lo, -math.pi / 2, rel_tol=1e-9)
    # slide ranges are lengths, never converted
    s = root.find("joint", "s")
    assert str(s.get("range")) == "-2 2"
    # the <default class="slider"> joint range is slide-typed too
    assert str(sub.first("joint").get("range")) == "-1 1"
    # idempotent: converting again changes nothing
    to_radians(root)
    lo2, _ = [float(x) for x in str(root.find("joint", "h")
                                    .get("range")).split()]
    assert lo2 == lo
