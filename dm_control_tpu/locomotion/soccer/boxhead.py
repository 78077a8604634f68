"""BoxHead soccer walker (reference: dm_control/locomotion/soccer/
boxhead.py; model from soccer/assets/boxhead/boxhead.xml)."""

from __future__ import annotations

from dm_control_tpu.locomotion.models.boxhead import MODEL
from dm_control_tpu.locomotion.walkers import base
from dm_control_tpu.suite._modelgen import to_element


class BoxHead(base.Walker):
    """A wheeled box-headed robot with steer/roll/kick actuators."""

    def _build(self, name="boxhead", walker_id=None, marker_rgba=None):
        self._walker_id = walker_id
        self._mjcf_root = to_element(MODEL)
        self._mjcf_root.attrib["model"] = name
        if marker_rgba is not None:
            rgba = " ".join(str(v) for v in marker_rgba)
            for geom in self._mjcf_root.find_all("geom"):
                geom.attrib["rgba"] = rgba

    @property
    def walker_id(self):
        return self._walker_id

    def create_root_joints(self, attachment_frame):
        """Three slide joints (reference soccer/boxhead.py:258-266) —
        yaw comes from the steer joint, so a free joint would make the
        mass matrix singular."""
        for name, axis in (("root_x", "1 0 0"), ("root_y", "0 1 0"),
                           ("root_z", "0 0 1")):
            from dm_control_tpu.mjcf.element import Element

            attachment_frame.children.insert(0, Element(
                "joint", {"name": f"{self.name}/{name}", "type": "slide",
                          "axis": axis}, parent=attachment_frame))

    def set_pose(self, physics, position=None, quaternion=None):
        import jax.numpy as jnp
        import numpy as np

        del quaternion  # orientation comes from the steer joint
        if position is None:
            return
        m = physics.model
        qpos = physics.data.qpos
        for i, name in enumerate(("root_x", "root_y", "root_z")):
            j = m.names.joint[f"{self.name}/{name}"]
            qpos = qpos.at[m.jnt_qposadr[j]].set(float(position[i]))
        physics._data = physics.data.replace(qpos=qpos)

    @property
    def root_body_name(self):
        return "head_body"

    @property
    def observable_joint_names(self):
        return ("steer", "kick", "roll")
