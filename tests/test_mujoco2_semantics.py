"""Pins the MuJoCo 2.0 (reference binary) vs 3.x (container oracle)
semantic divergences documented in docs/MUJOCO_SEMANTICS.md.

The reference pins mujoco200; this container oracles against mujoco 3.10.
Each test locks the behavior this engine implements for a default that
drifted between the two, so "matches the 3.10 oracle" is an explicit
choice with coverage rather than a silent equation of the two binaries.
"""

import numpy as np

import dm_control_tpu.mjcf as mjcf


def _compile(xml):
    return mjcf.compile_xml_string(xml)


def test_solimp_padding():
    """MuJoCo 2.0 solimp has 3 entries; 3.x has 5.  A 2.0-era partial spec
    must pad with the 3.x defaults (midpoint=0.5, power=2), under which the
    two impedance curves coincide (docs/MUJOCO_SEMANTICS.md #1)."""
    m = _compile("""
    <mujoco>
      <worldbody>
        <geom type="plane" size="1 1 .1"/>
        <body pos="0 0 1">
          <freejoint/>
          <geom type="sphere" size=".1" solimp="0.8 0.9 0.002"/>
        </body>
      </worldbody>
    </mujoco>""")
    np.testing.assert_allclose(
        np.asarray(m.geom_solimp[1]), [0.8, 0.9, 0.002, 0.5, 2.0])
    # untouched geoms keep the full 5-entry default
    np.testing.assert_allclose(
        np.asarray(m.geom_solimp[0]), [0.9, 0.95, 0.001, 0.5, 2.0])


def test_euler_implicit_damping():
    """Euler must be implicit in joint damping (2.0 behavior == 3.x
    eulerdamp default).  With b*h/m >> 2 an explicit update diverges;
    the implicit one decays monotonically (docs #2)."""
    import jax
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics import model as pm

    m = _compile("""
    <mujoco>
      <option timestep="0.01" gravity="0 0 0"/>
      <worldbody>
        <body>
          <joint name="h" type="hinge" axis="0 1 0" damping="50"/>
          <geom type="capsule" fromto="0 0 0 0.5 0 0" size=".04"
                mass="0.1"/>
        </body>
      </worldbody>
    </mujoco>""")
    d = pm.make_data(m)
    d = d.replace(qvel=d.qvel.at[0].set(10.0))
    step = jax.jit(lambda d: engine.step(m, d))
    speeds = []
    for _ in range(20):
        d = step(d)
        speeds.append(abs(float(d.qvel[0])))
    # explicit Euler with this stiffness ratio oscillates with growing
    # amplitude; implicit damping decays monotonically toward zero
    assert all(b < a + 1e-12 for a, b in zip(speeds, speeds[1:]))
    assert speeds[-1] < 1.0


def test_tendon_spring_deadband():
    """3.x tendon springlength is a (low, high) deadband; a scalar 2.0-era
    spec must replicate into both entries so the force law reduces to the
    classic single rest-length spring (docs #3)."""
    m = _compile("""
    <mujoco>
      <worldbody>
        <body pos="0 0 1">
          <joint name="s" type="slide" axis="0 0 1"/>
          <geom type="sphere" size=".05" mass="1"/>
          <site name="tip" pos="0 0 0"/>
        </body>
        <site name="anchor" pos="0 0 2"/>
      </worldbody>
      <tendon>
        <spatial name="t" stiffness="100" springlength="0.7">
          <site site="anchor"/>
          <site site="tip"/>
        </spatial>
      </tendon>
    </mujoco>""")
    low, high = np.asarray(m.tendon_lengthspring[0])
    assert low == high == 0.7

    m2 = _compile("""
    <mujoco>
      <worldbody>
        <body pos="0 0 1">
          <joint name="s" type="slide" axis="0 0 1"/>
          <geom type="sphere" size=".05" mass="1"/>
          <site name="tip" pos="0 0 0"/>
        </body>
        <site name="anchor" pos="0 0 2"/>
      </worldbody>
      <tendon>
        <spatial name="t" stiffness="100" springlength="0.5 1.5">
          <site site="anchor"/>
          <site site="tip"/>
        </spatial>
      </tendon>
    </mujoco>""")
    low2, high2 = np.asarray(m2.tendon_lengthspring[0])
    assert (low2, high2) == (0.5, 1.5)
    # inside the deadband (length = 1.0) the spring force must vanish
    import jax
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics import model as pm

    d = pm.make_data(m2)
    d = jax.jit(lambda d: engine.forward(m2, d))(d)
    assert abs(float(d.ten_length[0]) - 1.0) < 1e-9
    frc = float(d.qfrc_passive[0])
    assert abs(frc) < 1e-9, f"deadband spring leaked force {frc}"


def test_oracle_matches_on_drifted_defaults():
    """End-to-end: a model exercising rows #1-#3 stepped 50x matches the
    installed mujoco 3.10 oracle — the semantics this engine pins."""
    import pytest
    mujoco = pytest.importorskip("mujoco")
    import jax
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics import model as pm

    xml = """
    <mujoco>
      <option timestep="0.005"/>
      <worldbody>
        <geom type="plane" size="2 2 .1"/>
        <body pos="0 0 0.3">
          <joint name="h" type="hinge" axis="0 1 0" damping="2"
                 solimplimit="0.8 0.9 0.002" range="-60 60" limited="true"/>
          <geom type="capsule" fromto="0 0 0 0.4 0 0" size=".04" mass="1"/>
          <site name="tip" pos="0.4 0 0"/>
        </body>
        <site name="anchor" pos="0 0 1"/>
      </worldbody>
      <tendon>
        <spatial name="t" stiffness="40" springlength="0.6">
          <site site="anchor"/>
          <site site="tip"/>
        </spatial>
      </tendon>
    </mujoco>"""
    m = _compile(xml)
    d = pm.make_data(m)
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    step = jax.jit(lambda d: engine.step(m, d))
    for _ in range(50):
        d = step(d)
        mujoco.mj_step(mm, dd)
    np.testing.assert_allclose(np.asarray(d.qpos), dd.qpos, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d.qvel), dd.qvel, atol=1e-7)
