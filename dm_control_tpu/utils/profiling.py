"""Tracing/profiling helpers: jax.profiler integration + device timing.

The reference exposes MuJoCo's internal timers through
`scripts/print_profile.py` (reads a pstats dump) and relies on
TensorBoard's profiler for the torch training stack.  On TPU the
equivalents are (a) XLA device traces viewable in TensorBoard/Perfetto
and (b) wall-clock timing of compiled executables with proper device
synchronization.  This module wraps both so scripts and benchmarks share
one idiom:

    with profiling.trace("/tmp/tb"):          # XLA device trace
        run()

    ms = profiling.time_jitted(fn, *args)      # median device ms/call

    with profiling.annotate("rollout"):        # named trace region
        rollout()

Reference: dm_control/scripts/print_profile.py:1-4 (host profile dump),
dm_control/scripts/rl/ppo/ppo.py:119-160 (scalar/time logging).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Captures an XLA device trace into ``logdir`` (TensorBoard format).

    View with `tensorboard --logdir <logdir>` (Profile tab) or the
    Perfetto UI.  Works on TPU, GPU, and CPU backends.
    """
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the device timeline inside a trace."""
    return jax.profiler.TraceAnnotation(name)


def _sync(tree: Any) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.block_until_ready()
        except AttributeError:
            pass


def time_jitted(fn: Callable, *args, n_warmup: int = 1, n_iters: int = 10,
                **kwargs) -> Dict[str, float]:
    """Times a (jitted) callable with device synchronization.

    Returns dict with compile_s (first call, includes tracing+compile),
    median_ms / mean_ms / min_ms per subsequent call.  Synchronizes via
    block_until_ready on every output leaf so asynchronous dispatch does
    not hide device time.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _sync(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(0, n_warmup - 1)):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    median = times[n // 2] if n % 2 else 0.5 * (times[n // 2 - 1]
                                                + times[n // 2])
    return {
        "compile_s": compile_s,
        "median_ms": median * 1e3,
        "mean_ms": sum(times) / n * 1e3,
        "min_ms": times[0] * 1e3,
        "n_iters": float(n),
    }


class StepTimer:
    """Accumulates per-phase wall time across a training loop.

    Mirrors the reference PPO's time/rollout vs time/update split
    (ppo.py:119-160) without a TensorBoard dependency:

        timer = StepTimer()
        with timer.phase("rollout"):
            ...
        with timer.phase("update"):
            ...
        timer.summary()  # {"rollout_s": ..., "update_s": ..., ...}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, float] = {}
        self._n: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                _sync(sync)
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._n[name] = self._n.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        out = {}
        for k, v in self._acc.items():
            out[f"{k}_s"] = v
            out[f"{k}_mean_ms"] = v / max(1, self._n[k]) * 1e3
        return out

    def reset(self) -> None:
        self._acc.clear()
        self._n.clear()


def compiled_stats(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Static cost of the compiled executable: FLOPs + bytes accessed.

    Uses jax's ahead-of-time lowering (no device execution), so it is
    cheap and works for any jittable fn.  Values come from XLA's own
    cost analysis — the same numbers the profiler attributes to HLOs.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception:
        return {}
    out = {}
    for key in ("flops", "bytes accessed", "transcendentals"):
        if key in cost:
            out[key.replace(" ", "_")] = float(cost[key])
    return out
