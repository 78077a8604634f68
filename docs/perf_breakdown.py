"""Per-stage device-time breakdown of any batched model's step on TPU.

Run: python docs/perf_breakdown.py [suite:domain:task | manip:NAME] [batch]
Generalizes perf_humanoid_breakdown.py to arbitrary models (round-5
item 2: find where the Jaco manipulation substep's time actually goes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import (
    actuation as act_mod,
    collision as coll,
    dynamics as dyn,
    engine,
    inertia as inr,
    kinematics as kin,
    sensors as sens,
)
from dm_control_tpu.physics.model import make_data
from dm_control_tpu.utils import profiling


def load_model(spec):
    kind, _, rest = spec.partition(":")
    if kind == "suite":
        import dm_control_tpu.suite as suite

        domain, _, task = rest.partition(":")
        return suite.load(domain, task)._model
    if kind == "manip":
        import dm_control_tpu.manipulation as manipulation

        return manipulation.load_batch(rest).model
    raise SystemExit(f"unknown spec {spec}")


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "suite:humanoid:run"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    m = load_model(spec)
    d0 = make_data(m, jnp.float32)
    d0 = d0.replace(qvel=0.1 * jnp.ones_like(d0.qvel))
    dd = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), d0)

    stages = [
        ("kinematics", lambda d: kin.kinematics(m, d)),
        ("com_pos", lambda d: kin.com_pos(m, d)),
        ("crb", lambda d: inr.crb(m, d)),
        ("factor_m", lambda d: inr.factor_m(m, d)),
        ("collision", lambda d: coll.collision(m, d)),
        ("transmission", lambda d: act_mod.transmission(m, d)),
        ("com_vel", lambda d: kin.com_vel(m, d)),
        ("rne", lambda d: dyn.rne(m, d)),
        ("passive", lambda d: dyn.passive(m, d)),
        ("actuation", lambda d: act_mod.fwd_actuation(
            m, act_mod.actuator_velocity(m, d))),
        ("acceleration", lambda d: engine.fwd_acceleration(m, d)),
        ("constraint+solve", lambda d: engine.fwd_constraint(m, d)),
        ("sensors", lambda d: sens.sensor_acc(
            m, sens.sensor_vel(m, sens.sensor_pos(m, d)))),
    ]

    total = 0.0
    print(f"{spec} batch={batch}  (median device ms per vmapped stage call)")
    for name, fn in stages:
        vfn = jax.jit(jax.vmap(fn))
        try:
            ms = profiling.time_jitted(vfn, dd, n_warmup=2,
                                       n_iters=5)["median_ms"]
        except Exception as e:
            print(f"  {name:18s} FAILED {e!r}")
            continue
        dd = vfn(dd)
        total += ms
        print(f"  {name:18s} {ms:8.3f} ms", flush=True)
    print(f"  {'SUM':18s} {total:8.3f} ms")

    step = jax.jit(jax.vmap(lambda d: engine.step(m, d)))
    d1 = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), d0)
    ms = profiling.time_jitted(step, d1, n_warmup=2, n_iters=5)["median_ms"]
    print(f"  {'FULL STEP':18s} {ms:8.3f} ms  "
          f"-> {batch / ms * 1e3:,.0f} physics-steps/s")


if __name__ == "__main__":
    main()
