"""Probe: Newton-solver iteration statistics in the bench regime.

The bench steps humanoid:run from reset with zero actions -> bodies fall
into contact-rich piles.  Under vmap the solver while_loop runs until the
WORST env converges, so throughput is set by the niter tail, not the
mean.  Settles through the BatchEnv, then steps the raw engine (full
Data keeps solver_niter) and prints the tail.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dm_control_tpu.suite as suite
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics.model import make_data

    domain, task = (sys.argv[1] if len(sys.argv) > 1
                    else "humanoid:run").split(":")
    batches = [int(b) for b in (sys.argv[2:] or ["1024", "4096"])]
    env = suite.load_batch(domain, task)
    m = env.model

    for batch in batches:
        key = jax.random.PRNGKey(0)
        state, _ = env.reset(jax.random.split(key, batch))
        acts = jnp.zeros((batch, m.nu), jnp.float32)

        def run(state, n):
            def body(s, _):
                s, _ts = env.step(s, acts)
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state

        run_j = jax.jit(run, static_argnums=1)
        state = run_j(state, 50)  # settle into the contact-rich regime

        d0 = make_data(m, jnp.float32)
        dd = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), d0)
        dd = dd.replace(qpos=state.data.qpos, qvel=state.data.qvel,
                        qacc_warmstart=state.data.qacc_warmstart)
        step = jax.jit(jax.vmap(lambda d: engine.step(m, d)))
        dd = step(dd)
        jax.block_until_ready(dd.qpos)
        t0 = time.perf_counter()
        for _ in range(10):
            dd = step(dd)
        jax.block_until_ready(dd.qpos)
        dt = (time.perf_counter() - t0) / 10
        n2 = np.asarray(dd.solver_niter)
        print(f"B={batch}: {dt * 1e3:.1f} ms/physics-step "
              f"({batch / dt:,.0f} phys-steps/s) "
              f"niter p50={np.percentile(n2, 50):.0f} "
              f"p90={np.percentile(n2, 90):.0f} "
              f"p99={np.percentile(n2, 99):.0f} max={n2.max()}",
              flush=True)


def fixed_trips():
    """Same settled-state timing but with tolerance=0 so the while_loop
    always runs exactly opt.iterations trips at every batch size —
    separates per-trip cost from trip-count effects."""
    import dm_control_tpu.suite as suite
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics.model import make_data

    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batches = [int(b) for b in (sys.argv[3:] or ["1024", "4096"])]
    env = suite.load_batch("humanoid", "run")
    m = env.model
    m = m.replace(opt=m.opt.replace(tolerance=0.0, iterations=iters))

    for batch in batches:
        key = jax.random.PRNGKey(0)
        state, _ = env.reset(jax.random.split(key, batch))
        acts = jnp.zeros((batch, m.nu), jnp.float32)

        def run(state, n):
            def body(s, _):
                s, _ts = env.step(s, acts)
                return s, None
            state, _ = jax.lax.scan(body, state, None, length=n)
            return state

        state = jax.jit(run, static_argnums=1)(state, 50)

        d0 = make_data(m, jnp.float32)
        dd = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), d0)
        dd = dd.replace(qpos=state.data.qpos, qvel=state.data.qvel,
                        qacc_warmstart=state.data.qacc_warmstart)
        step = jax.jit(jax.vmap(lambda d: engine.step(m, d)))
        dd = step(dd)
        jax.block_until_ready(dd.qpos)
        t0 = time.perf_counter()
        for _ in range(5):
            dd = step(dd)
        jax.block_until_ready(dd.qpos)
        dt = (time.perf_counter() - t0) / 5
        print(f"B={batch} iters={iters}: {dt * 1e3:.1f} ms/step "
              f"= {dt / iters * 1e6:.0f} us/trip", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fixed":
        fixed_trips()
    else:
        main()
