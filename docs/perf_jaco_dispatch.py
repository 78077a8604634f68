"""Jaco dispatch-anomaly bisection (run ALONE on the TPU).

Times a tiny jitted kinematics program (B=8) per-call for:
  1. the humanoid suite model          (control: fast)
  2. the Jaco manipulation env model   (anomalous: ~1.4 s/call at B=1024)
  3. the standalone-compiled Jaco arm  (no composer/batch machinery)
Distinguishes model-content overhead from env-construction overhead,
and batch-dependence (B=8 vs B=1024) separates dispatch from compute.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import kinematics as kin
from dm_control_tpu.physics.model import make_data


def probe(name, m, batch=8, iters=10):
    d0 = make_data(m, jnp.float32)
    dd = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                      d0)
    vfn = jax.jit(jax.vmap(lambda d: kin.kinematics(m, d)))
    out = vfn(dd)
    jax.block_until_ready(out.xpos)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = vfn(dd)
    jax.block_until_ready(out.xpos)
    per = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name} B={batch}: {per:.2f} ms/call", flush=True)


def main():
    import dm_control_tpu.suite as suite

    probe("humanoid-suite", suite.load("humanoid", "run")._model)

    from dm_control_tpu.entities.manipulators.kinova import JacoArm
    from dm_control_tpu.physics.physics import Physics

    arm = JacoArm()
    m_arm = Physics.from_mjcf_model(arm.mjcf_model).model
    probe("jaco-arm-standalone", m_arm)

    import dm_control_tpu.manipulation as manipulation

    m_env = manipulation.load_batch("reach_site_features").model
    probe("jaco-env", m_env, batch=8)
    probe("jaco-env", m_env, batch=1024, iters=5)


if __name__ == "__main__":
    main()
