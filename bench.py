"""Throughput benchmark: env-steps/s of the batched physics engine.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is the fraction of the 1M aggregate env-steps/s target
(BASELINE.md; the reference publishes no in-repo numbers — its only env
parallelism is 8 worker processes over pipes, scripts/vec_env.py).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the cheetah fused step is a large scalar graph
# (~25 min cold compile through the remote-TPU tunnel, seconds when cached)
_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        os.path.join(os.path.dirname(
                            os.path.abspath(__file__)), ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass


def bench_env(domain, task, batch, n_steps, dtype=jnp.float32):
    import dm_control_tpu.suite as suite

    env = suite.load_batch(domain, task, dtype=dtype)
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(jax.random.split(key, batch))
    nu = env.model.nu
    acts = jnp.zeros((batch, nu), dtype)

    def run(state, n):
        def body(s, _):
            s, _ts = env.step(s, acts)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    run_j = jax.jit(run, static_argnums=1)
    # warmup with the SAME static n (different n = different executable),
    # and synchronize with a host readback — through the remote-TPU tunnel
    # block_until_ready can return before execution completes.
    state = run_j(state, n_steps)
    _ = float(state.data.qpos[0, 0])
    t0 = time.perf_counter()
    state = run_j(state, n_steps)
    _ = float(state.data.qpos[0, 0])
    dt = time.perf_counter() - t0
    control_steps = batch * n_steps
    physics_steps = control_steps * env.n_sub_steps
    return control_steps / dt, physics_steps / dt


def bench_manipulation(name, batch, n_steps, dtype=jnp.float32):
    import dm_control_tpu.manipulation as manipulation

    env = manipulation.load_batch(name, dtype=dtype)
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(jax.random.split(key, batch))
    acts = jnp.zeros((batch, env.model.nu), dtype)

    def run(state, n):
        def body(s, _):
            s, _ts = env.step(s, acts)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=n)
        return state

    run_j = jax.jit(run, static_argnums=1)
    state = run_j(state, n_steps)
    _ = float(state.data.qpos[0, 0])
    t0 = time.perf_counter()
    state = run_j(state, n_steps)
    _ = float(state.data.qpos[0, 0])
    dt = time.perf_counter() - t0
    control_steps = batch * n_steps
    return control_steps / dt, control_steps * env.n_sub_steps / dt


def main():
    results = {}
    try:
        cart_env, cart_phys = bench_env("cartpole", "swingup", 8192, 128)
        results["cartpole_env_steps_per_s"] = round(cart_env)
    except Exception as e:  # pragma: no cover
        results["cartpole_error"] = repr(e)[:120]
        cart_env = 0.0
    try:
        # ladder-2: contact-rich planar locomotion on the fused fast path
        chee_env, chee_phys = bench_env("cheetah", "run", 4096, 32)
        results["cheetah_env_steps_per_s"] = round(chee_env)
        results["cheetah_physics_steps_per_s"] = round(chee_phys)
    except Exception as e:  # pragma: no cover
        results["cheetah_error"] = repr(e)[:120]
    try:
        # ladder-3: flagship 21-DoF contact-rich humanoid (vectorized
        # grouped collision/constraint assembly keeps the graph compact)
        hum_env, hum_phys = bench_env("humanoid", "run", 1024, 32)
        results["humanoid_env_steps_per_s"] = round(hum_env)
        results["humanoid_physics_steps_per_s"] = round(hum_phys)
    except Exception as e:  # pragma: no cover
        results["humanoid_error"] = repr(e)[:120]
    try:
        # ladder-3b: quadruped:walk (ellipsoid feet, torque sensors)
        quad_env, quad_phys = bench_env("quadruped", "walk", 1024, 32)
        results["quadruped_env_steps_per_s"] = round(quad_env)
    except Exception as e:  # pragma: no cover
        results["quadruped_error"] = repr(e)[:120]
    try:
        # ladder-4: composer manipulation task on the batched path
        # (composer.batch.compile_task lowering)
        man_env, _ = bench_manipulation("reach_site_features", 1024, 32)
        results["manipulation_reach_env_steps_per_s"] = round(man_env)
    except Exception as e:  # pragma: no cover
        results["manipulation_error"] = repr(e)[:120]

    value = round(cart_env)
    print(json.dumps({
        "metric": "aggregate env-steps/s, cartpole:swingup batch 8192, "
                  "1 chip",
        "value": value,
        "unit": "env-steps/s",
        "vs_baseline": round(value / 1_000_000, 3),
        **results,
    }))


if __name__ == "__main__":
    main()
