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



_LAST_WINDOWS = []  # seconds per timed window of the most recent rung


def _time_run(run_j, state, n_steps, windows=3):
    """Best-of-N timed windows with host-readback sync.

    The remote-TPU tunnel intermittently stalls a single dispatch for
    many seconds (observed repeatedly in round 4); one poisoned window
    once under-reported a rung 3x.  The best window is the honest
    device throughput; all windows are recorded so BENCH json carries
    the variance (round-5 item 9: a single number can't distinguish a
    regression from tunnel noise).
    """
    state = run_j(state, n_steps)
    _ = float(state.data.qpos[0, 0])
    del _LAST_WINDOWS[:]
    for _i in range(windows):
        t0 = time.perf_counter()
        state = run_j(state, n_steps)
        _ = float(state.data.qpos[0, 0])
        _LAST_WINDOWS.append(time.perf_counter() - t0)
    return min(_LAST_WINDOWS)


def _windows_field(prefix, steps):
    """env-steps/s of each timed window, worst to best."""
    return {prefix + "_windows": sorted(
        round(steps / w) for w in _LAST_WINDOWS)}


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
    # warmup uses the SAME static n (different n = different executable)
    dt = _time_run(run_j, state, n_steps)
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
    dt = _time_run(run_j, state, n_steps)
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
    dt = _time_run(run_j, state, n_steps)
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
    best = float("inf")
    for _w in range(3):  # best-of-3 windows (tunnel stalls, see _time_run)
        t0 = time.perf_counter()
        for _ in range(n_updates):
            state, metrics = step_j(state)
        _ = float(metrics["mean_reward"])
        best = min(best, time.perf_counter() - t0)
    return batch * cfg.steps_per_batch * n_updates / best


def bench_ppo_train_humanoid(batch=512, n_updates=4, dtype=jnp.float32):
    """Humanoid-class PPO learner throughput: rollout + GAE + update on
    the 21-DoF contact-rich humanoid (the number a big-model training
    run actually sees)."""
    import dm_control_tpu.suite as suite
    from dm_control_tpu.rl import ppo

    env = suite.load_batch("humanoid", "run", dtype=dtype)
    cfg = ppo.PPOConfig(steps_per_batch=16, num_minibatches=4,
                        update_epochs=2)
    train_step, opt = ppo.make_train_step(env, cfg)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0), batch,
                                 opt)
    step_j = jax.jit(train_step)
    state, metrics = step_j(state)
    _ = float(metrics["mean_reward"])
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n_updates):
            state, metrics = step_j(state)
        _ = float(metrics["mean_reward"])
        best = min(best, time.perf_counter() - t0)
    return batch * cfg.steps_per_batch * n_updates / best


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


# -- rung registry ------------------------------------------------------------
# Each rung runs in its OWN subprocess (see main) so a pathological cold
# compile on one model can never sink the whole bench: the orchestrator
# enforces per-rung timeouts, a global budget, and emits the final JSON
# line even if it is SIGTERMed by an outer `timeout`.  Order = importance
# (the headline rung first; the heaviest cold compiles last).

def _rung_cartpole():
    env_sps, _ = bench_env("cartpole", "swingup", 8192, 128)
    return {"cartpole_env_steps_per_s": round(env_sps),
            **_windows_field("cartpole", 8192 * 128)}


def _rung_humanoid():
    # ladder-3: flagship 21-DoF contact-rich humanoid
    env_sps, phys_sps = bench_env("humanoid", "run", 1024, 32)
    return {"humanoid_env_steps_per_s": round(env_sps),
            "humanoid_physics_steps_per_s": round(phys_sps),
            **_windows_field("humanoid", 1024 * 32)}


def _rung_quadruped():
    # ladder-3b: quadruped:walk (ellipsoid feet, torque sensors)
    env_sps, _ = bench_env("quadruped", "walk", 1024, 32)
    return {"quadruped_env_steps_per_s": round(env_sps),
            **_windows_field("quadruped", 1024 * 32)}


def _rung_manipulation():
    # ladder-4: composer manipulation task on the batched path
    env_sps, _ = bench_manipulation("reach_site_features", 1024, 32)
    return {"manipulation_reach_env_steps_per_s": round(env_sps),
            **_windows_field("manipulation_reach", 1024 * 32)}


def _rung_soccer():
    # ladder-5a: 2v2 soccer (multi-agent rewards, goal autoreset)
    sps = bench_soccer(512, 32)
    return {"soccer_2v2_env_steps_per_s": round(sps),
            **_windows_field("soccer_2v2", 512 * 32)}


def _rung_tracking():
    # ladder-5b: multi-clip mocap tracking (comic reward)
    sps = bench_tracking(1024, 32)
    return {"tracking_env_steps_per_s": round(sps),
            **_windows_field("tracking", 1024 * 32)}


def _rung_ppo():
    # ladder-6: full jitted-PPO learner throughput
    return {"ppo_train_env_steps_per_s": round(bench_ppo_train())}


def _rung_ppo_humanoid():
    # ladder-6b: heavyweight-model learner (round-5 item 9: the training
    # story must not rest on cartpole alone)
    return {"ppo_train_humanoid_env_steps_per_s":
            round(bench_ppo_train_humanoid())}


def _rung_pallas():
    # on-chip correctness gate: Pallas kernels vs plain XLA
    return {"pallas_vs_xla_qpos_dev": float(f"{pallas_selfcheck():.3e}")}


def _rung_cheetah():
    # ladder-2: contact-rich planar locomotion on the fused fast path.
    # LAST: its fused scalar graph is by far the largest cold compile.
    env_sps, phys_sps = bench_env("cheetah", "run", 4096, 32)
    return {"cheetah_env_steps_per_s": round(env_sps),
            "cheetah_physics_steps_per_s": round(phys_sps)}


_RUNGS = [
    # (name, fn, per-rung timeout seconds)
    ("cartpole", _rung_cartpole, 900),
    ("humanoid", _rung_humanoid, 1200),
    ("quadruped", _rung_quadruped, 1200),
    ("manipulation", _rung_manipulation, 900),
    ("soccer", _rung_soccer, 900),
    ("tracking", _rung_tracking, 900),
    ("ppo_train", _rung_ppo, 900),
    ("ppo_train_humanoid", _rung_ppo_humanoid, 1200),
    ("pallas_selfcheck", _rung_pallas, 900),
    ("cheetah", _rung_cheetah, 2400),
]
_MARK = "RUNG_RESULT:"


def _run_rung(name):
    """Child-process entry: run one rung, print its result dict."""
    fn = dict((n, f) for n, f, _ in _RUNGS)[name]
    try:
        out = fn()
    except Exception as e:  # pragma: no cover
        out = {name + "_error": repr(e)[:160]}
    print(_MARK + json.dumps(out), flush=True)


def _emit(results):
    value = results.get("cartpole_env_steps_per_s", 0)
    print(json.dumps({
        "metric": "aggregate env-steps/s, cartpole:swingup batch 8192, "
                  "1 chip",
        "value": value,
        "unit": "env-steps/s",
        "vs_baseline": round(value / 1_000_000, 3),
        **results,
    }), flush=True)


def main():
    import signal
    import subprocess
    import sys

    budget = float(os.environ.get("DMCT_BENCH_BUDGET_S", "1500"))
    deadline = time.monotonic() + budget
    results = {}
    state = {"child": None}

    def _bail(signum, frame):  # outer `timeout` sent SIGTERM: emit + exit 0
        child = state["child"]
        if child is not None and child.poll() is None:
            child.kill()
        results.setdefault("bench_note", "interrupted by signal "
                           f"{signum}; partial results")
        _emit(results)
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGINT, _bail)

    def _run_rung(name, cap):
        left = deadline - time.monotonic()
        if left < 30:
            return "budget"
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rung", name],
            stdout=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        state["child"] = child
        try:
            out, _ = child.communicate(timeout=min(cap, left))
        except subprocess.TimeoutExpired:
            child.kill()
            child.communicate()
            results[name + "_error"] = f"timeout after {min(cap, left):.0f}s"
            return "timeout"
        finally:
            state["child"] = None
        got = [l for l in out.splitlines() if l.startswith(_MARK)]
        if got:
            results.update(json.loads(got[-1][len(_MARK):]))
            results.pop(name + "_error", None)
            return "ok"
        results[name + "_error"] = f"no result (rc={child.returncode})"
        return "fail"

    failed = []
    for name, _fn, cap in _RUNGS:
        status = _run_rung(name, cap)
        if status == "budget":
            results.setdefault("bench_note",
                               f"budget {budget:.0f}s exhausted at {name}")
            break
        if status in ("timeout", "fail"):
            failed.append((name, cap))
    # the remote-TPU tunnel intermittently stalls single runs for many
    # minutes (observed ~1-in-3 in round 4); one retry pass with the
    # remaining budget recovers those rungs
    for name, cap in failed:
        if deadline - time.monotonic() < 60:
            break
        _run_rung(name, cap)
    _emit(results)


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "--rung":
        _run_rung(sys.argv[2])
    else:
        main()
