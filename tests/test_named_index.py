"""Named indexing (physics.named FieldIndexer views).

Mirrors dm_control/mujoco/index_test.py semantics: row addressing by
name, ragged nq/nv/nsensordata axes, named columns, list keys, and
write-through with lazy forward.
"""

import numpy as np
import pytest

import dm_control_tpu.mjcf as mjcf
from dm_control_tpu.physics.physics import Physics

_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 .1"/>
    <body name="torso" pos="0 0 1">
      <freejoint name="root"/>
      <geom name="torso_geom" type="sphere" size="0.1"/>
      <site name="imu" pos="0 0 0.05"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="shoulder" type="hinge" axis="0 1 0"/>
        <geom name="arm_geom" type="capsule" fromto="0 0 0 0.2 0 0"
              size="0.03"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor name="lift" joint="shoulder" gear="1"/></actuator>
  <sensor>
    <gyro name="gyro" site="imu"/>
    <jointpos name="shoulder_pos" joint="shoulder"/>
  </sensor>
</mujoco>
"""


@pytest.fixture
def physics():
    p = Physics.from_xml_string(_XML)
    p.forward()
    return p


def test_named_rows_and_columns(physics):
    np.testing.assert_allclose(physics.named.data.xpos["torso"], [0, 0, 1])
    assert physics.named.data.xpos["torso", "z"] == pytest.approx(1.0)
    np.testing.assert_allclose(
        physics.named.data.xquat["torso", ["qw", "qx"]], [1, 0])
    # model views
    np.testing.assert_allclose(physics.named.model.body_pos["arm"],
                               [0.1, 0, 0])


def test_named_ragged_axes(physics):
    q = physics.named.data.qpos["root"]
    assert q.shape == (7,)  # free joint: 3 pos + 4 quat
    assert physics.named.data.qpos["shoulder"] == pytest.approx(0.0)
    v = physics.named.data.qvel["root"]
    assert v.shape == (6,)
    g = physics.named.data.sensordata["gyro"]
    assert g.shape == (3,)
    # single-element ragged entries collapse to scalars
    s = physics.named.data.sensordata["shoulder_pos"]
    assert np.ndim(s) == 0


def test_named_list_key(physics):
    both = physics.named.data.geom_xpos[["floor", "torso_geom"]]
    assert both.shape == (2, 3)


def test_named_write_through_with_lazy_forward(physics):
    physics.named.data.qpos["shoulder"] = 0.7
    assert physics.is_dirty
    assert physics.named.data.qpos["shoulder"] == pytest.approx(0.7)
    # derived read through bind reflects the new angle after lazy forward
    arm_z = physics.bind(
        mjcf_elem(physics, "body", "arm")).xpos[2]
    assert physics.named.data.xpos["arm", "z"] == pytest.approx(arm_z)


def mjcf_elem(physics, tag, name):
    class _E:
        def __init__(self, tag, name):
            self.tag = tag
            self._name = name

        def get(self, k, default=None):
            return self._name if k == "name" else default

    return _E(tag, name)


def test_named_column_write(physics):
    physics.named.model.geom_rgba["torso_geom", "r"] = 0.25
    assert physics.named.model.geom_rgba["torso_geom", "r"] == \
        pytest.approx(0.25)


def test_named_axes_listing(physics):
    rows, cols = physics.named.data.xpos.axes
    assert "torso" in rows and cols == ("x", "y", "z")
