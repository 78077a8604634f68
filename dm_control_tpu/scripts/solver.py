"""Trajectory optimization by sampling — the TPU-native solver.

Reference: dm_control/scripts/solver.py — segment-wise derivative-free
optimization of an action sequence against episode return (scipy Powell
per segment, solver.py:146-189) with receding-horizon passes that hand
physics state between segments (`set_task_state`, :60-71,217-268).

Powell is inherently sequential (one rollout per function evaluation on
the host).  The TPU-native equivalent is the cross-entropy method: a
population of candidate action segments rolls out **in parallel** under
one jit (vmap over candidates, lax.scan over time), elites refit a
Gaussian, iterate.  Hundreds of rollouts cost one device dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import engine


class CEMSolver:
    """Cross-entropy trajectory optimizer over a jax Task."""

    def __init__(self, model, task, n_sub_steps=1, segment_length=20,
                 n_iterations=8, population=128, elite_frac=0.1,
                 init_std=0.3, min_std=0.02, ctrl_range=None):
        self.model = model
        self.task = task
        self.n_sub_steps = n_sub_steps
        self.segment_length = segment_length
        self.n_iterations = n_iterations
        self.population = population
        self.n_elite = max(1, int(round(elite_frac * population)))
        self.init_std = init_std
        self.min_std = min_std
        nu = model.nu
        if ctrl_range is None:
            lo = np.where(np.asarray(model.actuator_ctrllimited, bool),
                          np.asarray(model.actuator_ctrlrange)[:, 0], -1.0)
            hi = np.where(np.asarray(model.actuator_ctrllimited, bool),
                          np.asarray(model.actuator_ctrlrange)[:, 1], 1.0)
        else:
            lo = np.full(nu, ctrl_range[0])
            hi = np.full(nu, ctrl_range[1])
        self._lo = jnp.asarray(lo)
        self._hi = jnp.asarray(hi)

        m, t, ns = model, task, n_sub_steps

        def rollout_return(d0, actions):
            """Return of one candidate [segment, nu] from state d0."""

            def step(d, a):
                d = t.before_step(m, d, a)
                for _ in range(ns):
                    d = engine.step(m, d)
                return d, t.reward(m, d)

            d_end, rs = jax.lax.scan(step, d0, actions)
            return jnp.sum(rs), d_end

        self._batch_returns = jax.jit(jax.vmap(
            lambda d0, acts: rollout_return(d0, acts)[0], in_axes=(None, 0)))
        self._apply_segment = jax.jit(
            lambda d0, acts: rollout_return(d0, acts)[1])

    def solve_segment(self, data, rng, mean_init=None):
        """Optimizes one segment from ``data`` (reference solver.py:146-189
        per-segment minimize).  Returns (actions, return)."""
        L, nu = self.segment_length, self.model.nu
        mean = (jnp.zeros((L, nu)) if mean_init is None
                else jnp.asarray(mean_init))
        std = jnp.full((L, nu), self.init_std)
        best_acts, best_ret = mean, -jnp.inf
        for it in range(self.n_iterations):
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, (self.population, L, nu))
            cands = jnp.clip(mean + std * noise, self._lo, self._hi)
            rets = self._batch_returns(data, cands)
            elite_idx = jnp.argsort(-rets)[:self.n_elite]
            elites = cands[elite_idx]
            mean = jnp.mean(elites, axis=0)
            std = jnp.maximum(jnp.std(elites, axis=0), self.min_std)
            if float(rets[elite_idx[0]]) > float(best_ret):
                best_ret = rets[elite_idx[0]]
                best_acts = cands[elite_idx[0]]
        return best_acts, float(best_ret)

    def solve(self, data, total_steps, seed=0, mean_init=None,
              verbose=False):
        """Receding-horizon optimization of ``total_steps`` actions
        (reference solver.py:217-268 segment loop with state handoff)."""
        rng = jax.random.PRNGKey(seed)
        segments = []
        t = 0
        while t < total_steps:
            L = min(self.segment_length, total_steps - t)
            rng, sub = jax.random.split(rng)
            seg_mean = None
            if mean_init is not None:
                seg_mean = jnp.asarray(mean_init)[t:t + self.segment_length]
            acts, ret = self.solve_segment(data, sub, seg_mean)
            acts = acts[:L]
            data = self._apply_segment(data, acts)  # state handoff
            segments.append(np.asarray(acts))
            if verbose:
                print(f"segment @{t}: return {ret:.4f}")
            t += L
        return np.concatenate(segments, axis=0)


def save_actions(fname, actions):
    """Writes `opt_acts_*.npy` (reference solver.py output artifact)."""
    np.save(fname, np.asarray(actions))
