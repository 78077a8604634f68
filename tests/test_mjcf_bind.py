"""PyMJCF binding layer: bind() attribute views + dirty/forward protocol.

Mirrors dm_control/mjcf/physics_test.py semantics: reading derived
quantities through a binding after a state write triggers the lazy
forward; model writes flow into subsequent dynamics; namescope collisions
are rejected at attach time.
"""

import numpy as np
import pytest

import dm_control_tpu.mjcf as mjcf
from dm_control_tpu.physics.physics import Physics


def _model():
    root = mjcf.Element("mujoco")
    root.add("option", timestep="0.002")
    wb = root.add("worldbody")
    wb.add("geom", name="floor", type="plane", size="2 2 .1")
    b = wb.add("body", name="ball", pos="0 0 1")
    b.add("joint", name="ball_x", type="slide", axis="1 0 0")
    b.add("joint", name="ball_z", type="slide", axis="0 0 1")
    g = b.add("geom", name="ball_geom", type="sphere", size="0.1")
    b.add("site", name="tip", pos="0 0 0.1")
    act = root.add("actuator")
    act.add("motor", name="push", joint="ball_x", gear="1")
    return root, b, g


def test_bind_reads_model_and_data():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    bb = physics.bind(body)
    np.testing.assert_allclose(bb.pos, [0, 0, 1])
    np.testing.assert_allclose(bb.xpos, [0, 0, 1])
    gg = physics.bind(geom)
    np.testing.assert_allclose(gg.size[0], 0.1)
    np.testing.assert_allclose(gg.xpos, [0, 0, 1])


def test_bind_write_state_triggers_lazy_forward():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    jz = root.find("joint", "ball_z")
    physics.bind(jz).qpos = 0.5  # raises the ball by 0.5
    assert physics.is_dirty
    # derived read through a binding must see the NEW kinematics
    np.testing.assert_allclose(physics.bind(body).xpos, [0, 0, 1.5])
    assert not physics.is_dirty


def test_bind_multiple_elements_and_ragged_qpos():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    joints = [root.find("joint", "ball_x"), root.find("joint", "ball_z")]
    jb = physics.bind(joints)
    jb.qpos = np.array([0.25, -0.25])
    np.testing.assert_allclose(np.asarray(physics.data.qpos),
                               [0.25, -0.25])
    np.testing.assert_allclose(physics.bind(body).xpos, [0.25, 0, 0.75])


def test_bind_model_write_changes_dynamics():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    g = physics.bind(geom)
    g.size = np.array([0.5, 0.0, 0.0])  # bigger ball: rests higher
    np.testing.assert_allclose(physics.bind(geom).size[0], 0.5)
    for _ in range(400):
        physics.step()
    # a 0.5-radius ball settles at z ~ 0.5 (not the original 0.1)
    assert float(physics.bind(body).xpos[2]) > 0.4


def test_bind_actuator_ctrl():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    motor = root.find("motor", "push")
    physics.bind(motor).ctrl = 0.7
    np.testing.assert_allclose(np.asarray(physics.data.ctrl), [0.7])


def test_bind_rejects_unnamed_and_mixed():
    root, body, geom = _model()
    physics = Physics.from_mjcf_model(root)
    anon = root.first("worldbody").add("site", pos="0 0 0")
    with pytest.raises(ValueError):
        physics.bind(anon)
    with pytest.raises(ValueError):
        physics.bind([body, geom])


def test_attach_detects_name_collision():
    from dm_control_tpu import composer
    from dm_control_tpu.entities.props.primitive import Primitive

    class Host(composer.Entity):
        def _build(self, name="host"):
            self._mjcf_root = mjcf.Element("mujoco")
            self._mjcf_root.add("worldbody")

    host = Host()
    host.attach(Primitive(geom_type="sphere", size=(0.05,), name="ball"))
    with pytest.raises(ValueError):
        host.attach(Primitive(geom_type="sphere", size=(0.05,),
                              name="ball"))
