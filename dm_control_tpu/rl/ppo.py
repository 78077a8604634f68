"""PPO in JAX: the TPU-native port of the reference training stack.

Reference: dm_control/scripts/rl/ppo/ppo.py (PPOBuffer with GAE-lambda at
:65-78, PPOTrainer rollout/update loop with clipped surrogate, value and
entropy losses and approx-KL early stopping at :96-253) and the ActorCritic
model (scripts/model.py:360).

Redesign for TPU: the rollout is a ``lax.scan`` over the batched env (no
host round-trips — the reference's 8 worker processes become an env axis on
the device mesh), advantages are computed on-device, and the update is a
scanned minibatch loop whose KL early-stop is a mask instead of a Python
break.  Everything is one jittable ``train_step`` that shards over the
``env`` mesh axis with replicated parameters (XLA inserts the gradient
psum over ICI).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from dm_control_tpu.rl.batch_env import BatchEnv


# ---------------------------------------------------------------------------
# Actor-critic network (plain pytree params; tanh MLP torso like the
# reference's FFNet/ActorCritic).
# ---------------------------------------------------------------------------


def _init_mlp(key, sizes, dtype=jnp.float32):
    params = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (fan_in, fan_out), dtype) \
            * jnp.sqrt(2.0 / fan_in)
        params.append({"w": w, "b": jnp.zeros(fan_out, dtype)})
    return params


def _mlp(params, x, final_activation=None):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jnp.tanh(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def init_actor_critic(key, obs_dim: int, act_dim: int,
                      hidden: Sequence[int] = (64, 64),
                      dtype=jnp.float32):
    kp, kv = jax.random.split(key)
    return {
        "pi": _init_mlp(kp, (obs_dim, *hidden, act_dim), dtype),
        "v": _init_mlp(kv, (obs_dim, *hidden, 1), dtype),
        "log_std": jnp.full((act_dim,), -0.5, dtype),
    }


def policy_distribution(params, obs):
    mean = _mlp(params["pi"], obs)
    return mean, jnp.exp(params["log_std"])


def value(params, obs):
    return _mlp(params["v"], obs)[..., 0]


def sample_action(params, obs, key):
    mean, std = policy_distribution(params, obs)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * eps
    logp = _gaussian_logp(mean, std, action)
    return action, logp


def _gaussian_logp(mean, std, action):
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - jnp.log(std)
                   - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


# ---------------------------------------------------------------------------
# Config / containers.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters (defaults follow scripts/rl/ppo/ppo.py:11-22)."""

    steps_per_batch: int = 128  # rollout length per train_step
    gamma: float = 0.99
    lam: float = 0.95
    clip_ratio: float = 0.2
    pi_lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    update_epochs: int = 4
    num_minibatches: int = 4
    max_grad_norm: float = 0.5
    target_kl: float = 0.015


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array
    # False on autoreset boundaries: the stored action was never executed
    # (the env reset instead), so the transition is excluded from the loss
    valid: jax.Array


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: Any
    last_obs: jax.Array
    rng: jax.Array


def flatten_obs(obs_dict) -> jax.Array:
    """OrderedDict of (B, ...) arrays → (B, obs_dim)."""
    parts = []
    for v in obs_dict.values():
        v = jnp.asarray(v)
        if v.ndim == 1:
            v = v[:, None]
        parts.append(v.reshape(v.shape[0], -1))
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# The jittable training step.
# ---------------------------------------------------------------------------


def make_train_step(env: BatchEnv, config: PPOConfig, optimizer=None,
                    obs_dtype=jnp.float32, mesh=None):
    """Builds ``train_step(state: TrainState) -> (TrainState, metrics)``.

    With ``mesh`` the env step runs under ``shard_map`` so each device
    steps only its local env shard with zero cross-device collectives
    (see parallel.shard_env_map); the learner stays global — XLA inserts
    the gradient psums over the mesh as usual.
    """
    optimizer = optimizer or optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.pi_lr))
    if mesh is not None and mesh.devices.size > 1:
        from dm_control_tpu.parallel import shard_env_map
        env_step = shard_env_map(mesh, env._step_batched)
    else:
        env_step = env.step

    def rollout_step(carry, _):
        params, env_state, obs, rng = carry
        rng, akey = jax.random.split(rng)
        action, logp = sample_action(params, obs, akey)
        val = value(params, obs)
        env_state, ts = env_step(env_state, action.astype(
            env_state.data.qpos.dtype))
        next_obs = flatten_obs(ts.observation).astype(obs_dtype)
        done = (ts.step_type == 2)
        # step_type FIRST means the env auto-reset this step: the action
        # was never executed, and obs is the previous episode's terminal
        # observation — mask this transition out of the loss
        valid = (ts.step_type != 0)
        trans = Transition(obs=obs, action=action, logp=logp, value=val,
                           reward=ts.reward.astype(obs_dtype),
                           done=done, valid=valid)
        return (params, env_state, next_obs, rng), trans

    def compute_gae(traj: Transition, last_val):
        def scan_fn(carry, t):
            gae, next_val = carry
            nonterminal = 1.0 - t.done.astype(last_val.dtype)
            delta = (t.reward + config.gamma * next_val * nonterminal
                     - t.value)
            gae = delta + config.gamma * config.lam * nonterminal * gae
            return (gae, t.value), gae

        (_, _), adv = jax.lax.scan(
            scan_fn, (jnp.zeros_like(last_val), last_val), traj,
            reverse=True)
        return adv, adv + traj.value

    def loss_fn(params, batch, adv, ret):
        mean, std = policy_distribution(params, batch.obs)
        logp = _gaussian_logp(mean, std, batch.action)
        w = batch.valid.astype(adv.dtype)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        log_ratio = logp - batch.logp
        ratio = jnp.exp(log_ratio)
        clipped = jnp.clip(ratio, 1 - config.clip_ratio,
                           1 + config.clip_ratio)
        pi_loss = -jnp.sum(jnp.minimum(ratio * adv, clipped * adv) * w) \
            / wsum
        v = value(params, batch.obs)
        v_loss = jnp.sum((v - ret) ** 2 * w) / wsum
        entropy = jnp.sum(params["log_std"]
                          + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        # the (exp(lr)-1)-lr estimator of the reference (ppo.py:221-226)
        approx_kl = jnp.sum(((ratio - 1.0) - log_ratio) * w) / wsum
        total = (pi_loss + config.vf_coef * v_loss
                 - config.ent_coef * entropy)
        return total, (pi_loss, v_loss, approx_kl)

    def train_step(state: TrainState):
        rng, rkey = jax.random.split(state.rng)
        (params, env_state, last_obs, _), traj = jax.lax.scan(
            rollout_step,
            (state.params, state.env_state, state.last_obs, rkey),
            None, length=config.steps_per_batch)
        last_val = value(params, last_obs)
        adv, ret = compute_gae(traj, last_val)
        # flatten (T, B, ...) → (T*B, ...)
        flat = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), traj)
        adv_f = adv.reshape(-1)
        ret_f = ret.reshape(-1)
        # normalize over valid transitions only (autoreset boundaries carry
        # junk advantages that would skew the statistics)
        w = flat.valid.astype(adv_f.dtype)
        wsum = jnp.maximum(w.sum(), 1.0)
        mean_v = (adv_f * w).sum() / wsum
        var_v = (((adv_f - mean_v) ** 2) * w).sum() / wsum
        adv_f = (adv_f - mean_v) / (jnp.sqrt(var_v) + 1e-8)

        n = adv_f.shape[0]
        mb = n // config.num_minibatches

        def epoch_body(carry, _):
            params, opt_state, rng, stop = carry
            rng, pkey = jax.random.split(rng)
            perm = jax.random.permutation(pkey, n)

            def mb_body(carry, idx):
                params, opt_state, stop = carry
                take = jax.lax.dynamic_slice_in_dim(perm, idx * mb, mb)
                batch = jax.tree.map(lambda x: x[take], flat)
                (_, (pi_l, v_l, kl)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch, adv_f[take],
                                           ret_f[take])
                updates, new_opt = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                # KL early stop (reference ppo.py:221-226) as a mask: the
                # reference breaks BEFORE applying the offending update, so
                # the freshly computed KL gates this minibatch's step too
                stop = jnp.logical_or(stop, kl > 1.5 * config.target_kl)
                params = jax.tree.map(
                    lambda old, new: jnp.where(stop, old, new),
                    params, new_params)
                opt_state = jax.tree.map(
                    lambda old, new: jnp.where(stop, old, new),
                    opt_state, new_opt)
                return (params, opt_state, stop), (pi_l, v_l, kl)

            (params, opt_state, stop), metrics = jax.lax.scan(
                mb_body, (params, opt_state, stop),
                jnp.arange(config.num_minibatches))
            return (params, opt_state, rng, stop), metrics

        (params, opt_state, rng, _), metrics = jax.lax.scan(
            epoch_body,
            (params, state.opt_state, rng, jnp.asarray(False)),
            None, length=config.update_epochs)
        pi_l, v_l, kl = metrics
        out_metrics = {
            "pi_loss": pi_l[-1, -1],
            "v_loss": v_l[-1, -1],
            "approx_kl": kl[-1, -1],
            "mean_reward": traj.reward.mean(),
            "env_steps": jnp.asarray(
                config.steps_per_batch * traj.reward.shape[1], jnp.int32),
        }
        return TrainState(params=params, opt_state=opt_state,
                          env_state=env_state, last_obs=last_obs,
                          rng=rng), out_metrics

    return train_step, optimizer


def init_train_state(env: BatchEnv, config: PPOConfig, rng, batch_size: int,
                     optimizer, obs_dtype=jnp.float32) -> TrainState:
    rng, ekey, pkey = jax.random.split(rng, 3)
    env_state, ts = env.reset(jax.random.split(ekey, batch_size))
    obs = flatten_obs(ts.observation).astype(obs_dtype)
    act_dim = env.model.nu
    params = init_actor_critic(pkey, obs.shape[-1], act_dim)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      env_state=env_state, last_obs=obs, rng=rng)


# ---------------------------------------------------------------------------
# Checkpointing + training loop with scalar logging (reference
# scripts/rl/ppo/ppo.py:119-160 TensorBoard scalars; trainer.py:56-60
# torch.save checkpoints).
# ---------------------------------------------------------------------------


def save_train_state(path: str, state: TrainState) -> None:
    """Serializes the full jitted-PPO TrainState (params, optimizer,
    env state, rng) so training resumes exactly.  Saved as the flat leaf
    list (custom pytree nodes like EnvState aren't msgpack-serializable
    directly); the treedef comes from the restore-side template."""
    from flax import serialization

    leaves = jax.tree.leaves(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(leaves))


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restores a TrainState saved by ``save_train_state``; ``template``
    provides the pytree structure/shapes (e.g. a fresh init_train_state)."""
    from flax import serialization

    leaves_t, treedef = jax.tree.flatten(template)
    with open(path, "rb") as f:
        leaves = serialization.from_bytes(leaves_t, f.read())
    return jax.tree.unflatten(treedef, leaves)


def train(env: BatchEnv, config: PPOConfig, *, batch_size: int,
          total_steps: int, rng=None, logdir: Optional[str] = None,
          checkpoint_path: Optional[str] = None,
          checkpoint_every: int = 10, log_every: int = 1,
          resume: bool = False):
    """Runs jitted PPO until ``total_steps`` env steps, logging scalar
    metrics (incl. env-steps/s) and periodically checkpointing.

    Returns (final TrainState, list of metric dicts)."""
    import time as _time

    from dm_control_tpu.utils.metrics import MetricsWriter

    rng = jax.random.PRNGKey(0) if rng is None else rng
    train_step, optimizer = make_train_step(env, config)
    state = init_train_state(env, config, rng, batch_size, optimizer)
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state = restore_train_state(checkpoint_path, state)
    step_fn = jax.jit(train_step)

    writer = MetricsWriter(logdir) if logdir else None
    history = []
    env_steps = 0
    it = 0
    while env_steps < total_steps:
        t0 = _time.perf_counter()
        state, metrics = step_fn(state)
        jax.block_until_ready(metrics["pi_loss"])
        dt = _time.perf_counter() - t0
        it += 1
        env_steps += int(metrics["env_steps"])
        scalars = {k: float(v) for k, v in metrics.items()}
        scalars["fps"] = int(metrics["env_steps"]) / dt
        scalars["total_env_steps"] = env_steps
        history.append(scalars)
        if writer and it % log_every == 0:
            writer.write(env_steps, scalars, group="train")
        if checkpoint_path and it % checkpoint_every == 0:
            save_train_state(checkpoint_path, state)
    if checkpoint_path:
        save_train_state(checkpoint_path, state)
    if writer:
        writer.close()
    return state, history
