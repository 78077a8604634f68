"""Jaco solver-iteration probe: is the manipulation rung trip-bound?

Settles the batched reach env, then steps the raw engine and prints the
Newton-iteration distribution.  Run alone on the TPU (tunnel contention
poisons timings).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dm_control_tpu.manipulation as manipulation
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics.model import make_data

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    env = manipulation.load_batch("reach_site_features")
    m = env.model
    state, _ = env.reset(jax.random.split(jax.random.PRNGKey(0), batch))
    acts = jnp.zeros((batch, m.nu), jnp.float32)

    def run(state, n):
        def body(s, _):
            s, _ts = env.step(s, acts)
            return s, None
        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    state = jax.jit(run, static_argnums=1)(state, 20)

    d0 = make_data(m, jnp.float32)
    dd = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), d0)
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
          f"niter p50={np.percentile(n2, 50):.0f} "
          f"p90={np.percentile(n2, 90):.0f} "
          f"p99={np.percentile(n2, 99):.0f} max={n2.max()} "
          f"(opt.iterations={int(m.opt.iterations)})", flush=True)


if __name__ == "__main__":
    main()
