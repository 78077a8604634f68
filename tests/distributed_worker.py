"""Worker process for the jax.distributed two-process test.

Run as: python tests/distributed_worker.py <rank> <coordinator_port>

Each of the 2 processes owns 2 virtual CPU devices; together they form a
(2 hosts x 2 devices) ('host', 'env') mesh over DCN(gloo)+"ICI".  Each
process materializes ONLY its own env shard, assembles the global env
batch, and runs one full jitted PPO train step — gradient psums cross
the process boundary through gloo collectives.  This is the code path a
real multi-host TPU pod runs (SURVEY §2.10); the reference has no
equivalent (its only cross-process machinery is vec_env pipes).
"""

import os
import sys


def main() -> None:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ.setdefault("MUJOCO_GL", "disabled")

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from dm_control_tpu.parallel import runtime as rt

    # each worker compiles the train step independently; under machine
    # load the ranks can finish many minutes apart, so the shutdown
    # barrier needs far more than its 300 s default before the
    # coordination service declares the slower rank dead
    rt.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=2, process_id=rank,
                  shutdown_timeout_seconds=1200)
    assert jax.process_count("cpu") == 2, jax.process_count("cpu")

    import jax.numpy as jnp
    import numpy as np

    import dm_control_tpu.suite as suite
    from dm_control_tpu.rl import ppo

    mesh = rt.pod_mesh(devices=jax.devices("cpu"))
    assert mesh.devices.shape == (2, 2), mesh.devices.shape

    env = suite.load_batch("cartpole", "swingup", dtype=jnp.float32)
    cfg = ppo.PPOConfig(steps_per_batch=2, num_minibatches=2,
                        update_epochs=1)
    train_step, opt = ppo.make_train_step(env, cfg, mesh=mesh)

    # each process initializes ONLY its local env shard (4 envs); the same
    # param/rng seed everywhere keeps the replicated leaves consistent
    local = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0), 4, opt)
    state = ppo.TrainState(
        params=jax.device_put(local.params, rt.replicated(mesh)),
        opt_state=jax.device_put(local.opt_state, rt.replicated(mesh)),
        env_state=rt.make_global_env_batch(mesh, local.env_state),
        last_obs=rt.make_global_env_batch(mesh, local.last_obs),
        rng=jax.device_put(local.rng, rt.replicated(mesh)),
    )
    rt.assert_partitioned(state.env_state, mesh)
    assert state.env_state.data.qpos.shape[0] == 8  # global batch

    state, metrics = jax.jit(train_step)(state)
    jax.block_until_ready(metrics)
    reward = float(metrics["mean_reward"])
    assert np.isfinite(reward)
    # every process must agree on the replicated result
    print(f"DIST_OK rank={rank} procs={jax.process_count('cpu')} "
          f"mean_reward={reward:.6f}", flush=True)


if __name__ == "__main__":
    main()
