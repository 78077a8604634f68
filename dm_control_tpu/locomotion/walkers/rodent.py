"""Rodent walker (reference: dm_control/locomotion/walkers/rodent.py:60).

The reference Rat is mesh-based (third_party/rodent assets).  This
primitive-geometry rodent provides the equivalent capability surface —
a quadruped torso+head body plan with hip/knee joints per leg, a
spine-mounted head with a tracking site, touch-sensored paws, and
position actuators — built procedurally like the primitive Jaco
substitute (entities/manipulators/arm.py).
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.locomotion.walkers import base
from dm_control_tpu.mjcf.element import Element

_LEGS = (
    ("fl", (0.07, 0.035)), ("fr", (0.07, -0.035)),
    ("hl", (-0.07, 0.035)), ("hr", (-0.07, -0.035)),
)


class Rat(base.Walker):
    """Primitive-geometry rodent."""

    def _build(self, name="rodent"):
        root = Element("mujoco", {"model": name})
        root.add("option", timestep="0.002")
        wb = root.add("worldbody")
        act = root.add("actuator")
        sensors = root.add("sensor")

        torso = wb.add("body", name="torso", pos="0 0 0.06")
        torso.add("geom", name="torso_geom", type="capsule",
                  fromto="-0.08 0 0 0.08 0 0", size="0.03", mass="0.6")
        torso.add("site", name="imu", pos="0 0 0", size="0.005")
        sensors.add("gyro", name="gyro", site="imu")
        sensors.add("accelerometer", name="accelerometer", site="imu")
        sensors.add("velocimeter", name="velocimeter", site="imu")

        head = torso.add("body", name="head", pos="0.1 0 0.015")
        head.add("joint", name="neck", type="hinge", axis="0 1 0",
                 range="-30 30", limited="true", damping="0.1",
                 armature="0.002")
        head.add("geom", name="head_geom", type="sphere", size="0.02",
                 mass="0.05")
        head.add("site", name="head_site", pos="0.02 0 0", size="0.004")
        act.add("position", name="neck", joint="neck", kp="0.5",
                ctrllimited="true", ctrlrange="-1 1")

        for leg, (x, y) in _LEGS:
            hip = torso.add("body", name=f"{leg}_hip", pos=f"{x} {y} -0.02")
            hip.add("joint", name=f"{leg}_hip", type="hinge",
                    axis="0 1 0", range="-60 60", limited="true",
                    damping="0.3", armature="0.005")
            hip.add("geom", name=f"{leg}_thigh", type="capsule",
                    fromto="0 0 0 0 0 -0.025", size="0.008", mass="0.03")
            knee = hip.add("body", name=f"{leg}_knee", pos="0 0 -0.025")
            knee.add("joint", name=f"{leg}_knee", type="hinge",
                     axis="0 1 0", range="-60 60", limited="true",
                     damping="0.3", armature="0.005")
            knee.add("geom", name=f"{leg}_shin", type="capsule",
                     fromto="0 0 0 0 0 -0.02", size="0.006", mass="0.02")
            foot = knee.add("body", name=f"{leg}_foot", pos="0 0 -0.02")
            foot.add("geom", name=f"{leg}_foot_geom", type="sphere",
                     size="0.008", mass="0.01", friction="1.2 0.005 0.0001")
            foot.add("site", name=f"{leg}_foot_site", size="0.008")
            sensors.add("touch", name=f"{leg}_touch",
                        site=f"{leg}_foot_site")
            for j in (f"{leg}_hip", f"{leg}_knee"):
                act.add("position", name=j, joint=j, kp="0.6",
                        ctrllimited="true", ctrlrange="-1 1")
        self._mjcf_root = root

    @property
    def root_body_name(self):
        return "torso"

    @property
    def end_effector_body_names(self):
        return tuple(f"{leg}_foot" for leg, _ in _LEGS)

    @property
    def observable_joint_names(self):
        return ("neck",) + tuple(
            f"{leg}_{j}" for leg, _ in _LEGS for j in ("hip", "knee"))

    def aliveness(self, physics):
        """0 when upright, approaching -1 when flipped (reference
        rodent.py aliveness via torso z-axis)."""
        zz = float(np.asarray(self.root_xmat(physics))[2, 2])
        return (zz - 1.0) / 2.0
