"""Tests for the tracing/profiling helpers (utils/profiling.py)."""

import glob
import os

import jax
import jax.numpy as jnp

from dm_control_tpu.utils import profiling


def test_time_jitted_reports_timing():
    @jax.jit
    def f(x):
        return (x * 2.0).sum()

    stats = profiling.time_jitted(f, jnp.ones((64, 64)), n_iters=3)
    assert stats["compile_s"] > 0
    assert stats["median_ms"] > 0
    assert stats["min_ms"] <= stats["mean_ms"] + 1e-9
    assert stats["n_iters"] == 3


def test_step_timer_accumulates():
    timer = profiling.StepTimer()
    with timer.phase("rollout"):
        pass
    with timer.phase("rollout"):
        pass
    with timer.phase("update", sync=jnp.ones(4) * 2):
        pass
    s = timer.summary()
    assert s["rollout_s"] >= 0
    assert s["update_mean_ms"] >= 0
    timer.reset()
    assert timer.summary() == {}


def test_trace_writes_profile(tmp_path):
    # start_trace collects from EVERY registered backend; through the
    # remote-TPU tunnel that adds minutes of collection latency, so only
    # exercise the trace path on all-local-device sessions
    if any(d.platform not in ("cpu", "gpu", "tpu")
           or d.platform == "tpu" for d in jax.devices()):
        import pytest
        pytest.skip("remote-tunnel backend present; trace collection slow")
    logdir = str(tmp_path / "tb")

    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((32, 32))
    f(x).block_until_ready()  # compile outside the trace
    with profiling.trace(logdir):
        with profiling.annotate("matmul_region"):
            f(x).block_until_ready()
    # jax writes plugins/profile/<run>/*.xplane.pb under the logdir
    found = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert found, f"no trace files under {logdir}"


def test_compiled_stats_flops():
    def f(a, b):
        return a @ b

    stats = profiling.compiled_stats(
        f, jnp.ones((128, 128)), jnp.ones((128, 128)))
    # XLA cost analysis may be empty on some backends; when present the
    # matmul flops must dominate
    if "flops" in stats:
        assert stats["flops"] >= 2 * 128 * 128 * 128 * 0.5
