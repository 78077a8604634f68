"""Interactive viewer API (reference: dm_control/viewer/ — GLFW
application with `launch(environment_loader, policy)` at
viewer/__init__.py:30 and runtime state machine runtime.py:75).

Rendering is off-path in this framework (BASELINE.md north star: optional
debug raster).  This module preserves the `viewer.launch` entry point:
with no GUI backend it runs the environment/policy loop headlessly and
reports episode statistics, so `visualize.py`-style scripts work
unchanged; a GUI backend can be plugged in via `register_backend`.
"""

from __future__ import annotations

import numpy as np

_BACKEND = None


def register_backend(fn):
    """Registers fn(env, policy) used by launch() for interactive GUI."""
    global _BACKEND
    _BACKEND = fn


def launch(environment_loader, policy=None, title="Explorer",
           width=1024, height=768, max_episodes=1):
    """Runs the env/policy loop (reference viewer/__init__.py:30 launch).

    Headless fallback: steps episodes with the policy (or zero actions)
    and prints returns — the observable behavior of the viewer's runtime
    without the GL window."""
    del title, width, height
    env = (environment_loader() if callable(environment_loader)
           else environment_loader)
    if _BACKEND is not None:
        return _BACKEND(env, policy)
    for ep in range(max_episodes):
        ts = env.reset()
        total, steps = 0.0, 0
        spec = env.action_spec()
        while not ts.last():
            if policy is not None:
                action = policy(ts)
            else:
                action = np.zeros(spec.shape)
            ts = env.step(action)
            total += float(ts.reward or 0.0)
            steps += 1
        print(f"[viewer headless] episode {ep}: {steps} steps, "
              f"return {total:.3f}")
    return None
