"""Batched environment runtime: thousands of envs in lockstep under one jit.

This replaces the reference's process-per-env ``SubprocVecEnv``
(dm_control/scripts/vec_env.py:396-532, pipes + cloudpickle) with the
TPU-native design: the env batch is a single ``EnvState`` pytree with a
leading env axis, stepped by ``vmap``-ed pure functions; auto-reset and
divergence handling are per-env masks, not control flow; the batch can be
sharded over a device mesh (see ``dm_control_tpu.parallel``).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import engine
from dm_control_tpu.physics.model import Model, make_data
from dm_control_tpu.rl.control import (
    FIRST, LAST, MID, EnvState, RandomContext, Task, TimeStepData,
    apply_model_diff, compute_n_steps,
)


def _n_candidates(model: Model) -> int:
    """Total candidate contacts the static broadphase admits."""
    from dm_control_tpu.physics import collision

    return sum(nrows * len(pairs)
               for _, nrows, pairs in collision.contact_groups(model))


class BatchEnv:
    """Vectorized, jit-compiled environment.

    Pure-functional API (state in, state out):

        env = BatchEnv(model, task, time_limit=..., control_timestep=...)
        state, ts = env.reset(jax.random.split(key, batch))   # batched
        state, ts = env.step(state, actions)                  # batched

    ``step`` auto-resets environments whose previous step was LAST (or that
    diverged), re-randomizing their episode via the per-env PRNG stream —
    the batched analogue of dm_env's reset-on-next-step convention
    (dm_control/rl/control.py:94-123).
    """

    def __init__(self, model: Model, task: Task,
                 time_limit: float = float("inf"),
                 control_timestep: Optional[float] = None,
                 autoreset: bool = True,
                 dtype=None,
                 contact_cap: Optional[int] = None):
        # Contact compaction (physics/constraints._contact_rows_compact):
        # None = auto — engage when the static broadphase admits far more
        # candidates than can plausibly touch at once.  0 disables; an
        # int pins the per-condim-group cap.
        if contact_cap is None and "DMCT_CONTACT_CAP" in os.environ:
            contact_cap = int(os.environ["DMCT_CONTACT_CAP"])
        if contact_cap is None and (dtype is None or dtype == jnp.float32):
            # Engage only for models whose broadphase admits far more
            # candidates than can touch (the Jaco stack: 671).  Paired
            # TPU measurement: at humanoid scale (177 candidates) the
            # top-k + dynamic-gather jacobians cost MORE than the
            # dropped rows save (19.3k -> 13.4k env-steps/s), while at
            # Jaco scale throughput is neutral and compile time / J-array
            # memory drop ~5x/10x (docs/perf_r4.md).
            ncand = len(model.collision_pairs) and _n_candidates(model)
            contact_cap = 64 if ncand > 512 else 0
        if contact_cap:
            model = model.replace(
                opt=model.opt.replace(contact_cap=int(contact_cap)))
        if dtype is not None and dtype != model.qpos0.dtype:
            # Under enable_x64 an f64 model's constants would promote the
            # f32 carry (qvel = qvel + timestep * qacc -> f64) and break
            # the scan/while carries; without x64 the cast is an identity
            # at trace time.  Float leaves only — index arrays stay int.
            model = jax.tree.map(
                lambda x: jnp.asarray(x, dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else x, model)
        self.model = model
        self.task = task
        self.autoreset = autoreset
        physics_timestep = float(jnp.asarray(model.opt.timestep))
        control_timestep = control_timestep or physics_timestep
        # tolerance accommodates float32-compiled models (the dm_env
        # adapter keeps the reference's strict 1e-8 with f64 models)
        self.n_sub_steps = compute_n_steps(control_timestep,
                                           physics_timestep, tolerance=1e-4)
        if time_limit == float("inf"):
            self.step_limit = jnp.iinfo(jnp.int32).max
        else:
            self.step_limit = int(round(time_limit / control_timestep))
        self._dtype = dtype
        # Between steps only the true physics state is carried; every
        # derived field (FK frames, contacts, forces, sensors) is recomputed
        # by forward() next step.  Dropping them from the state pytree (None
        # = empty subtree) keeps a lax.scan rollout carry to ~5 buffers
        # instead of ~50 — on TPU the full-Data carry costs ~2x wall time
        # in loop-carried copies (kernel-count bound).
        self._template = make_data(model, dtype)
        # zero-sized state fields (e.g. act with na == 0) are stripped from
        # the carry too: a single (B, 0) leaf in a sharded scan carry forces
        # a per-iteration host rendezvous on multi-device backends (measured
        # 25x step slowdown on a 4-device CPU mesh), and carrying them buys
        # nothing — _unstrip restores the empty buffer from the template
        self._state_fields = tuple(
            f for f in ("qpos", "qvel", "act", "qacc_warmstart", "time")
            if getattr(self._template, f).size > 0)
        self._derived_fields = tuple(
            f for f in type(self._template).__dataclass_fields__
            if f not in self._state_fields
            and getattr(self._template, f) is not None)

        # fused scalar-chain fast path (physics/fastpath.py): exact same
        # step for qualifying small models as one SSA graph — kernel-count
        # bound rollouts go ~5-10x faster.  Disabled per-env-model when a
        # model_diff overrides fields the fast path folded into constants.
        from dm_control_tpu.physics import fastpath as _fastpath

        self._fast_step1 = None
        diff_keys = set(task.initial_model_diff(model))
        raw = None
        if diff_keys <= _fastpath.DIFF_SAFE_FIELDS:
            raw = _fastpath.build_step(model)
        if (raw is None and not diff_keys
                and self._template.qpos.dtype == jnp.float32
                and os.environ.get("DMCT_FASTSMOOTH", "0") == "1"):
            # hybrid fused-smooth tier (free/ball mid-size models, e.g.
            # humanoid): SSA smooth dynamics + batched constraint solver.
            # DEFAULT OFF — measured 15% SLOWER than the general engine
            # on TPU (humanoid substep 9.8 vs 8.5 ms, batch 1024): the
            # SSA->array stack boundaries (cdof/qM/contact concatenates)
            # shatter XLA fusion into ~3.7k kernels vs the general
            # path's ~1k (docs/perf_r4.md).  Kept as an opt-in
            # (DMCT_FASTSMOOTH=1) correctness-verified reference for a
            # future all-scalar formulation.  Requires an empty
            # model_diff — baked geom poses feed the narrowphase.
            raw = _fastpath.build_smooth_step(model)
        if raw is not None:
            # the fused step computes with f64 model constants; under
            # enable_x64 that promotes, so cast back to the carry dtype
            def _cast_step(qp, qv, w, ctrl, _raw=raw):
                out = _raw(qp, qv, w, ctrl)
                return tuple(jnp.asarray(x, qp.dtype) for x in out)

            _cast_step.fk_observe_ok = raw.fk_observe_ok
            if hasattr(raw, "fk_fields"):
                def _cast_fk(qp, diff, _raw=raw):
                    return {k: jnp.asarray(v, qp.dtype)
                            for k, v in _raw.fk_fields(qp, diff).items()}

                _cast_step.fk_fields = _cast_fk
            self._fast_step1 = _cast_step

        self.reset = jax.jit(jax.vmap(self._reset_one))
        self.step = jax.jit(self._step_batched)

    # -- stripped-carry helpers ---------------------------------------------

    def _strip(self, d):
        """Drops derived fields from the carry pytree."""
        return d.replace(**{f: None for f in self._derived_fields})

    def _unstrip(self, d):
        """Rebuilds a full Data from carried state + the zero template."""
        return self._template.replace(
            **{f: getattr(d, f) for f in self._state_fields})

    # -- single-env pure functions (vmapped above) --------------------------

    def _init_state(self, rng) -> EnvState:
        m = self.model
        task = self.task
        rng, key = jax.random.split(rng)
        d = make_data(m, self._dtype)
        diff = task.initial_model_diff(m)
        rc = RandomContext(key=key)
        qpos, qvel, diff = task.init(m, d.qpos, jnp.zeros_like(d.qvel), rc,
                                     diff)
        d = d.replace(qpos=qpos, qvel=qvel)

        if task.max_reset_rejections:
            def cond(carry):
                k, dd, n = carry
                return task.reject(apply_model_diff(m, diff), dd) \
                    & (n < task.max_reset_rejections)

            def body(carry):
                k, dd, n = carry
                k, sub = jax.random.split(k)
                rc2 = RandomContext(key=sub)
                qp, qv, _ = task.init(
                    m, jnp.asarray(m.qpos0, dd.qpos.dtype),
                    jnp.zeros_like(dd.qvel), rc2, diff)
                return k, dd.replace(qpos=jnp.asarray(qp, dd.qpos.dtype),
                                     qvel=jnp.asarray(qv, dd.qvel.dtype)), \
                    n + 1

            rng, dd, _ = jax.lax.while_loop(
                cond, body, (rng, d, jnp.asarray(0, jnp.int32)))
            d = dd

        mm = apply_model_diff(m, diff)
        if task.settle_steps:
            if self._fast_step1 is not None:
                def sub(_, c):
                    return self._fast_step1(c[0], c[1], c[2], d.ctrl)
                qp, qv, w = jax.lax.fori_loop(
                    0, task.settle_steps, sub,
                    (d.qpos, d.qvel, d.qacc_warmstart))
                d = d.replace(qpos=qp, qvel=qv, qacc_warmstart=w)
            else:
                d = jax.lax.fori_loop(0, task.settle_steps,
                                      lambda i, dd: engine.step(mm, dd), d)
            d = d.replace(time=jnp.zeros_like(d.time))
        return EnvState(data=d, model_diff=diff, rng=rng,
                        step_count=jnp.asarray(0, jnp.int32),
                        needs_reset=jnp.asarray(False))

    def _observe(self, state: EnvState):
        from dm_control_tpu.physics import sensors as sens

        m = apply_model_diff(self.model, state.model_diff)
        d = state.data
        if (self._fast_step1 is not None
                and self._fast_step1.fk_observe_ok):
            d = d.replace(**self._fast_step1.fk_fields(
                d.qpos, state.model_diff))
            return state.replace(data=d), self.task.observation(m, d)
        if getattr(self.task, "observation_stages", "acc") == "vel":
            # The task declared its observables position/velocity-stage
            # only (suite/base.py): skip CRB, the mass-matrix factor,
            # collision, RNE, and acc-stage sensors — the reference pays
            # the same reduced cost via mj_step1 (engine.py:149-166).
            from dm_control_tpu.physics import actuation as act_mod
            from dm_control_tpu.physics import kinematics as kin

            d = kin.kinematics(m, d)
            d = kin.com_pos(m, d)
            d = kin.tendon(m, d)
            d = act_mod.transmission(m, d)
            d = sens.sensor_pos(m, d)
            d = act_mod.actuator_velocity(m, d)
            if m.ntendon:
                d = d.replace(ten_velocity=d.ten_moment @ d.qvel)
            d = kin.com_vel(m, d)
            d = sens.sensor_vel(m, d)
            return state.replace(data=d), self.task.observation(m, d)
        d = engine.fwd_position(m, d)
        d = sens.sensor_pos(m, d)
        d = engine.fwd_velocity(m, d)
        d = sens.sensor_vel(m, d)
        d = sens.sensor_acc(m, d)
        return state.replace(data=d), self.task.observation(m, d)

    def _reset_one(self, rng):
        state = self._init_state(rng)
        state, obs = self._observe(state)
        dtype = state.data.qpos.dtype
        ts = TimeStepData(
            step_type=jnp.asarray(FIRST, jnp.int32),
            reward=jnp.zeros(getattr(self.task, "reward_shape", ()), dtype),
            discount=jnp.asarray(1.0, dtype),
            observation=obs)
        return state.replace(data=self._strip(state.data)), ts

    def _plain_step(self, state: EnvState, action):
        m = apply_model_diff(self.model, state.model_diff)
        task = self.task
        d = task.before_step(m, self._unstrip(state.data), action)
        if self._fast_step1 is not None:
            dt = d.qpos.dtype
            def sub(_, c):
                return self._fast_step1(c[0], c[1], c[2], d.ctrl)
            carry = (d.qpos, d.qvel, d.qacc_warmstart)
            if self.n_sub_steps > 1:
                carry = jax.lax.fori_loop(0, self.n_sub_steps, sub, carry)
            else:
                carry = sub(0, carry)
            h = jnp.asarray(self.model.opt.timestep, dt)
            d = d.replace(qpos=carry[0], qvel=carry[1],
                          qacc_warmstart=carry[2],
                          time=d.time + self.n_sub_steps * h)
        else:
            d = jax.lax.fori_loop(0, self.n_sub_steps,
                                  lambda i, dd: engine.step(m, dd), d) \
                if self.n_sub_steps > 1 else engine.step(m, d)
        state = state.replace(data=d,
                              step_count=state.step_count + 1)
        state, obs = self._observe(state)
        d = state.data
        reward = task.reward(m, d)
        terminate, term_discount = task.termination(m, d)
        diverged = engine.check_divergence(m, d)
        # divergence absorbs into termination with discount 0 (the batched
        # analogue of composer's raise_exception_on_physics_error=False,
        # dm_control/composer/environment.py:358-391)
        timeout = state.step_count >= self.step_limit
        last = terminate | diverged | timeout
        dtype = reward.dtype if hasattr(reward, "dtype") else d.qpos.dtype
        discount = jnp.where(
            diverged, jnp.zeros((), dtype),
            jnp.where(terminate, jnp.asarray(term_discount, dtype),
                      jnp.ones((), dtype)))
        reward = jnp.where(diverged, jnp.zeros((), dtype),
                           jnp.asarray(reward, dtype))
        ts = TimeStepData(
            step_type=jnp.where(last, LAST, MID).astype(jnp.int32),
            reward=reward, discount=discount, observation=obs)
        return state.replace(data=self._strip(state.data),
                             needs_reset=last), ts

    def _step_one(self, state: EnvState, action):
        if not self.autoreset:
            return self._plain_step(state, action)

        def do_reset(_):
            rng, sub = jax.random.split(state.rng)
            new_state, ts = self._reset_one(sub)
            return new_state.replace(rng=rng), ts

        def do_step(_):
            return self._plain_step(state, action)

        return jax.lax.cond(state.needs_reset, do_reset, do_step, None)

    def _step_batched(self, state: EnvState, action):
        """Batched step with amortized autoreset.

        A per-env lax.cond under vmap lowers to select — BOTH branches
        execute every step, so episode re-initialization (incl. e.g.
        cheetah's 200 settle steps) would be paid on every control step.
        Instead: step everything, then a SCALAR-predicate cond runs the
        vmapped reset only on steps where some env actually finished
        (~1/episode_len of steps), and a mask merges the results — the
        per-env semantics are unchanged."""
        stepped_state, stepped_ts = jax.vmap(self._plain_step)(
            state, action)
        if not self.autoreset:
            return stepped_state, stepped_ts

        def merge(need):
            def sel(a, b):
                m = need.reshape(need.shape + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)
            return sel

        def do_resets(_):
            pairs = jax.vmap(jax.random.split)(state.rng)
            rngs, subs = pairs[:, 0], pairs[:, 1]
            new_state, new_ts = jax.vmap(self._reset_one)(subs)
            new_state = new_state.replace(rng=rngs)
            sel = merge(state.needs_reset)
            return (jax.tree_util.tree_map(sel, new_state, stepped_state),
                    jax.tree_util.tree_map(sel, new_ts, stepped_ts))

        return jax.lax.cond(jnp.any(state.needs_reset), do_resets,
                            lambda _: (stepped_state, stepped_ts), None)


def rollout(env: BatchEnv, policy_fn, rng, batch_size: int, n_steps: int):
    """Rolls out ``n_steps`` with ``action = policy_fn(key, obs)``; returns
    (final_state, per-env summed reward).  Utility for tests/benchmarks."""
    keys = jax.random.split(rng, batch_size)
    state, ts = env.reset(keys)

    def body(carry, _):
        state, obs, total, key = carry
        key, sub = jax.random.split(key)
        action = policy_fn(sub, obs)
        state, ts2 = env.step(state, action)
        return (state, ts2.observation, total + ts2.reward, key), None

    total0 = jnp.zeros((batch_size,), state.data.qpos.dtype)
    (state, _, total, _), _ = jax.lax.scan(
        body, (state, ts.observation, total0, rng), None, length=n_steps)
    return state, total
