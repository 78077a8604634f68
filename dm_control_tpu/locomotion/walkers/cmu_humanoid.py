"""CMU humanoid walkers
(reference: dm_control/locomotion/walkers/cmu_humanoid.py:183-422)."""

from __future__ import annotations

import numpy as np

from dm_control_tpu.locomotion.models.humanoid_cmu_v2019 import (
    MODEL as MODEL_2019,
)
from dm_control_tpu.locomotion.models.humanoid_cmu_v2020 import (
    MODEL as MODEL_2020,
)
from dm_control_tpu.locomotion.walkers import base
from dm_control_tpu.suite._modelgen import to_element

_POSITION_ACTUATOR_KP = 300.0


class CMUHumanoid(base.Walker):
    """Torque-actuated CMU humanoid
    (model: reference walkers/assets/humanoid_CMU_V2019.xml)."""

    _MODEL = MODEL_2019

    def _build(self, name="walker"):
        self._mjcf_root = to_element(self._MODEL)
        self._mjcf_root.attrib["model"] = name

    @property
    def root_body_name(self):
        for e in self._mjcf_root.first("worldbody").iter():
            if e.tag == "body":
                return e.get("name")
        raise ValueError("no root body")

    @property
    def observable_joint_names(self):
        return tuple(e.get("name") for e in self._mjcf_root.iter()
                     if e.tag == "joint" and e.get("name")
                     and e.get("type") != "free")

    @property
    def end_effector_body_names(self):
        names = [e.get("name") for e in self._mjcf_root.iter()
                 if e.tag == "body" and e.get("name")]
        return tuple(n for n in names
                     if any(k in n for k in ("hand", "foot", "toes")))

    @property
    def mocap_joint_names(self):
        return self.observable_joint_names


class CMUHumanoidPositionControlled(CMUHumanoid):
    """Position-actuated variant: each torque actuator is replaced by a
    position servo (reference cmu_humanoid.py:350-422;
    scaled_actuators.add_position_actuator)."""

    def _build(self, name="walker"):
        super()._build(name=name)
        actuator_sec = self._mjcf_root.first("actuator")
        if actuator_sec is None:
            return
        old = list(actuator_sec.children)
        actuator_sec.children.clear()
        joint_ranges = {e.get("name"): e.get("range")
                        for e in self._mjcf_root.iter()
                        if e.tag == "joint" and e.get("name")}
        for act in old:
            joint = act.get("joint")
            if joint is None:
                actuator_sec.children.append(act)
                continue
            rng = joint_ranges.get(joint)
            kwargs = dict(name=act.get("name", joint), joint=joint,
                          kp=str(_POSITION_ACTUATOR_KP),
                          ctrllimited="true")
            if rng:
                kwargs["ctrlrange"] = rng
            actuator_sec.add("position", **kwargs)

    def cmu_pose_to_actuation(self, target_pose):
        """Maps a mocap joint pose to position-actuator controls
        (reference cmu_humanoid.py:422): identity for position servos with
        ctrlrange == joint range."""
        return np.asarray(target_pose)


class CMUHumanoidPositionControlledV2020(CMUHumanoidPositionControlled):
    """The 2020 revision of the model."""

    _MODEL = MODEL_2020
