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


def _bench_batch_env(env, batch, n_steps):
    """Times an already-built BatchEnv (shared by the ladder rungs)."""
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(jax.random.split(key, batch))
    acts = jnp.zeros((batch, env.model.nu), state.data.qpos.dtype)

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
    return batch * n_steps / dt


def bench_soccer(batch, n_steps, dtype=jnp.float32):
    """BASELINE ladder rung 5a: 2v2 boxhead soccer under one jit."""
    from dm_control_tpu.locomotion import soccer

    return _bench_batch_env(soccer.load_batch(team_size=2, dtype=dtype),
                            batch, n_steps)


def bench_tracking(batch, n_steps, dtype=jnp.float32):
    """BASELINE ladder rung 5b: multi-clip mocap tracking (clip bank as
    per-env data, comic reward, reference_rel_* observations)."""
    from dm_control_tpu.composer.batch import compile_task
    from dm_control_tpu.locomotion.arenas.floors import Floor
    from dm_control_tpu.locomotion.mocap.loader import (
        synthetic_walking_trajectory,
    )
    from dm_control_tpu.locomotion.mocap.types import ClipCollection
    from dm_control_tpu.locomotion.tasks.reference_pose import (
        MultiClipMocapTracking,
    )
    from dm_control_tpu.locomotion.walkers.jumping_ball import (
        RollingBallWithHead,
    )

    walker = RollingBallWithHead()
    nq = 7 + len(walker.observable_joint_names)
    trajs = {f"clip{i}": synthetic_walking_trajectory(
        nq=nq, nv=nq - 1, num_steps=120, seed=i) for i in range(4)}
    task = MultiClipMocapTracking(
        walker, Floor(), trajs, dataset=ClipCollection(ids=tuple(trajs)),
        termination_error_threshold=50.0, reward_type="comic")
    return _bench_batch_env(compile_task(task, time_limit=10.0,
                                         dtype=dtype), batch, n_steps)


def bench_ppo_train(batch=2048, n_updates=8, dtype=jnp.float32):
    """Sustained jitted-PPO training throughput (rollout + GAE + update)
    on cartpole — env-steps/s through the FULL learner, not just the
    physics (the number a training run actually sees)."""
    import dm_control_tpu.suite as suite
    from dm_control_tpu.rl import ppo

    env = suite.load_batch("cartpole", "swingup", dtype=dtype)
    cfg = ppo.PPOConfig(steps_per_batch=32, num_minibatches=4,
                        update_epochs=2)
    train_step, opt = ppo.make_train_step(env, cfg)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0), batch,
                                 opt)
    step_j = jax.jit(train_step)
    state, metrics = step_j(state)
    _ = float(metrics["mean_reward"])
    t0 = time.perf_counter()
    for _ in range(n_updates):
        state, metrics = step_j(state)
    _ = float(metrics["mean_reward"])
    dt = time.perf_counter() - t0
    return batch * cfg.steps_per_batch * n_updates / dt


def pallas_selfcheck(batch=256, n_steps=5):
    """On-chip correctness gate for the Pallas fast paths: steps the
    humanoid batch with the Pallas kernels enabled vs DMCT_PALLAS=0
    (plain XLA, real qLD factorization) and compares trajectories.
    Returns the max |qpos| deviation — ~1e-5 is fp32 reorder noise."""
    import os

    import dm_control_tpu.suite as suite
    from dm_control_tpu.physics import engine
    from dm_control_tpu.physics.model import make_data

    env = suite.load("humanoid", "run")
    m = env._model
    d0 = make_data(m, jnp.float32)
    d0 = d0.replace(qvel=0.05 * jnp.ones_like(d0.qvel))
    dd = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
                      d0)

    def run(tag):
        step = jax.jit(lambda d: jax.vmap(lambda x: engine.step(m, x))(d))
        out = dd
        for _ in range(n_steps):
            out = step(out)
        return jnp.asarray(out.qpos)

    old = os.environ.get("DMCT_PALLAS")
    try:
        os.environ["DMCT_PALLAS"] = "1"
        q_pallas = run("pallas")
        os.environ["DMCT_PALLAS"] = "0"
        q_xla = run("xla")
    finally:
        if old is None:
            os.environ.pop("DMCT_PALLAS", None)
        else:
            os.environ["DMCT_PALLAS"] = old
    return float(jnp.max(jnp.abs(q_pallas - q_xla)))


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
    try:
        # ladder-5a: 2v2 soccer (multi-agent rewards, goal autoreset)
        results["soccer_2v2_env_steps_per_s"] = round(
            bench_soccer(512, 32))
    except Exception as e:  # pragma: no cover
        results["soccer_error"] = repr(e)[:120]
    try:
        # ladder-5b: multi-clip mocap tracking (comic reward)
        results["tracking_env_steps_per_s"] = round(
            bench_tracking(1024, 32))
    except Exception as e:  # pragma: no cover
        results["tracking_error"] = repr(e)[:120]
    try:
        # ladder-6: full jitted-PPO learner throughput
        results["ppo_train_env_steps_per_s"] = round(bench_ppo_train())
    except Exception as e:  # pragma: no cover
        results["ppo_train_error"] = repr(e)[:120]
    try:
        # on-chip correctness gate: Pallas kernels vs plain XLA
        results["pallas_vs_xla_qpos_dev"] = float(
            f"{pallas_selfcheck():.3e}")
    except Exception as e:  # pragma: no cover
        results["pallas_selfcheck_error"] = repr(e)[:120]

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
