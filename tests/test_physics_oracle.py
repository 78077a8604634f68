"""Physics engine parity vs the MuJoCo oracle (installed mujoco 3.10).

The reference's native engine is libmujoco200 (unavailable); the installed
mujoco + dm_control serve as the numerical oracle: identical models stepped
in both engines from identical states must produce matching trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
common = pytest.importorskip("dm_control.suite.common")

import dm_control_tpu.mjcf as mjcf_tpu
from dm_control_tpu.physics import engine, model as model_mod

# (model, n_steps, tolerance): chaotic contact-rich models accumulate fp
# noise, so the trajectory tolerance is looser for them.
CASES = [
    ("pendulum.xml", 100, 1e-12),
    ("cartpole.xml", 100, 1e-12),
    ("acrobot.xml", 100, 1e-12),
    ("point_mass.xml", 100, 1e-12),
    ("reacher.xml", 100, 1e-12),
    ("swimmer.xml", 100, 1e-12),
    ("ball_in_cup.xml", 100, 1e-12),
    ("cheetah.xml", 50, 1e-6),
    ("walker.xml", 50, 1e-6),
    ("hopper.xml", 50, 1e-6),
]

_CACHE = {}


def _load(name):
    if name not in _CACHE:
        xml = common.read_model(name)
        assets = dict(common.ASSETS)
        m = mjcf_tpu.compile_model(
            mjcf_tpu.from_xml_string(xml, assets=assets))
        mm = mujoco.MjModel.from_xml_string(xml, assets)
        _CACHE[name] = (m, mm)
    return _CACHE[name]


@pytest.mark.parametrize("name,n_steps,tol", CASES,
                         ids=[c[0] for c in CASES])
def test_trajectory_matches_oracle(name, n_steps, tol):
    m, mm = _load(name)
    assert (m.nq, m.nv, m.nu) == (mm.nq, mm.nv, mm.nu)
    dd = mujoco.MjData(mm)
    rng = np.random.RandomState(0)
    qpos0 = mm.qpos0 + rng.uniform(-0.05, 0.05, mm.nq)
    qvel0 = rng.uniform(-0.05, 0.05, mm.nv)
    ctrl = rng.uniform(-0.5, 0.5, mm.nu)
    dd.qpos[:] = qpos0
    dd.qvel[:] = qvel0
    dd.ctrl[:] = ctrl
    d = model_mod.make_data(m)
    d = d.replace(qpos=jnp.asarray(qpos0), qvel=jnp.asarray(qvel0),
                  ctrl=jnp.asarray(ctrl))
    step = jax.jit(lambda d: engine.step(m, d))
    for _ in range(n_steps):
        d = step(d)
        mujoco.mj_step(mm, dd)
    np.testing.assert_allclose(np.asarray(d.qpos), dd.qpos, atol=tol)
    np.testing.assert_allclose(np.asarray(d.qvel), dd.qvel, atol=tol)


@pytest.mark.parametrize("name", [c[0] for c in CASES])
def test_compiled_model_fields_match(name):
    m, mm = _load(name)
    np.testing.assert_allclose(np.asarray(m.qpos0), mm.qpos0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass,
                               atol=1e-10)
    # principal-axis order can legitimately differ when the inertia matrix
    # is numerically diagonal; compare the full tensors instead
    def tensors(inertia, iquat):
        out = []
        for i in range(len(inertia)):
            w, x, y, z = iquat[i]
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]])
            out.append(r @ np.diag(inertia[i]) @ r.T)
        return np.stack(out)

    np.testing.assert_allclose(
        tensors(np.asarray(m.body_inertia), np.asarray(m.body_iquat)),
        tensors(mm.body_inertia, mm.body_iquat), atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_pos), mm.body_pos,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.dof_invweight0),
                               mm.dof_invweight0, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(m.body_invweight0),
                               mm.body_invweight0, rtol=1e-8)
    np.testing.assert_allclose(float(m.stat.meaninertia), mm.stat.meaninertia,
                               rtol=1e-8)
    assert tuple(m.jnt_type) == tuple(mm.jnt_type.ravel())
    assert tuple(m.geom_type) == tuple(mm.geom_type.ravel())


def test_energy_conservation_pendulum():
    """RK4 pendulum with no damping conserves energy."""
    xml = """
    <mujoco>
      <option timestep="0.001" integrator="RK4"/>
      <worldbody>
        <body pos="0 0 1">
          <joint name="hinge" type="hinge" axis="0 1 0"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.5" size="0.02" mass="1"/>
        </body>
      </worldbody>
    </mujoco>"""
    m = mjcf_tpu.compile_xml_string(xml)
    d = model_mod.make_data(m)
    d = d.replace(qpos=jnp.asarray([1.5]))

    def energy(d):
        d = engine.fwd_position(m, d)
        d = engine.fwd_velocity(m, d)
        # potential + kinetic
        com_z = d.xipos[1, 2]
        pot = float(m.body_mass[1] * 9.81 * com_z)
        kin = float(0.5 * d.qvel @ d.qM @ d.qvel)
        return pot + kin

    e0 = energy(d)
    step = jax.jit(lambda d: engine.step(m, d))
    for _ in range(1000):
        d = step(d)
    e1 = energy(d)
    assert abs(e1 - e0) < 1e-6 * max(1.0, abs(e0))
