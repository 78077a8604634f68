"""Host-loop PPO over a VecEnv.

Reference: dm_control/scripts/rl/ppo/ppo.py — `PPOBuffer` (steps×envs
storage, GAE-λ `compute_returns_and_advantage`, :25-78), `PPOTrainer`
rollout→update loop with clipped surrogate, value+entropy losses,
approx-KL early stop (:96-253).

This is the host-environment variant (composer envs with Python hooks,
stepped through VecEnv).  The fully jit-compiled PPO — rollout, GAE and
updates inside one compiled program over a BatchEnv — lives in
``dm_control_tpu.rl.ppo``; use that for suite (pure-jax) tasks.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


class PPOBuffer:
    """steps×envs rollout storage with GAE-λ
    (reference scripts/rl/ppo/ppo.py:25-78)."""

    def __init__(self, obs_dim, act_dim, n_envs, buffer_size, gamma, lam):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.n_envs, self.buffer_size = n_envs, buffer_size
        self.gamma, self.gae_lambda = gamma, lam
        self.reset()

    def reset(self):
        B, E = self.buffer_size, self.n_envs
        self.observations = np.zeros((B, E, self.obs_dim), np.float32)
        self.actions = np.zeros((B, E, self.act_dim), np.float32)
        self.rewards = np.zeros((B, E), np.float32)
        self.dones = np.zeros((B, E), np.float32)
        self.values = np.zeros((B, E), np.float32)
        self.log_probs = np.zeros((B, E), np.float32)
        self.advantages = np.zeros((B, E), np.float32)
        self.returns = np.zeros((B, E), np.float32)
        self.ptr = 0

    def store(self, obs, act, rew, done, val, logp):
        i = self.ptr
        self.observations[i] = obs
        self.actions[i] = act
        self.rewards[i] = rew
        self.dones[i] = done
        self.values[i] = val
        self.log_probs[i] = logp
        self.ptr += 1

    def compute_returns_and_advantage(self, last_values):
        """GAE-λ (reference ppo.py:65-78)."""
        last_gae = 0.0
        for step in reversed(range(self.buffer_size)):
            if step == self.buffer_size - 1:
                next_values = last_values
            else:
                next_values = self.values[step + 1]
            nonterminal = 1.0 - self.dones[step]
            delta = (self.rewards[step]
                     + self.gamma * next_values * nonterminal
                     - self.values[step])
            last_gae = (delta + self.gamma * self.gae_lambda
                        * nonterminal * last_gae)
            self.advantages[step] = last_gae
        self.returns = self.advantages + self.values

    def get(self):
        self.ptr = 0
        flat = lambda x: x.reshape(-1, *x.shape[2:])
        return dict(obs=flat(self.observations), act=flat(self.actions),
                    ret=flat(self.returns), adv=flat(self.advantages),
                    val=flat(self.values), logp=flat(self.log_probs))


class PPOTrainerConfig:
    """reference ppo.py:80-94 (defaults = the reference's flags)."""

    def __init__(self, **kw):
        self.max_epochs = kw.get("max_epochs", 100)
        self.steps_per_epoch = kw.get("steps_per_epoch", 2048)
        self.gradient_steps_per_update = kw.get(
            "gradient_steps_per_update", 64)
        self.lr = kw.get("lr", 3e-4)
        self.clip_ratio = kw.get("clip_ratio", 0.2)
        self.ent_coef = kw.get("ent_coef", 0.0)
        self.vf_coef = kw.get("vf_coef", 0.5)
        self.grad_norm_clip = kw.get("grad_norm_clip", 0.5)
        self.gamma = kw.get("gamma", 0.99)
        self.lam = kw.get("lam", 0.97)
        self.target_kl = kw.get("target_kl", 0.01)
        self.eval_episodes = kw.get("eval_episodes", 5)
        self.minibatch_size = kw.get("minibatch_size", 256)
        self.seed = kw.get("seed", 0)


class PPOTrainer:
    """Rollout→update loop (reference ppo.py:96-253).  The policy is the
    flax ``ActorCritic`` (scripts/model.py); losses+updates are one jit."""

    def __init__(self, policy, vec_env, eval_env, config):
        self.policy = policy
        self.env = vec_env
        self.eval_env = eval_env
        self.config = config
        self.rng = jax.random.PRNGKey(config.seed)

        self._opt = optax.chain(
            optax.clip_by_global_norm(config.grad_norm_clip),
            optax.adam(config.lr))

        @jax.jit
        def act(params, obs, rng):
            pi, a, v, logp = policy.apply(
                {"params": params}, obs, deterministic=False, rng=rng)
            return a, v, logp

        @jax.jit
        def act_det(params, obs):
            pi, a, v, logp = policy.apply(
                {"params": params}, obs, deterministic=True)
            return a

        @jax.jit
        def update_minibatch(params, opt_state, batch):
            cfg = config

            def loss_fn(p):
                pi, _, v, logp = policy.apply(
                    {"params": p}, batch["obs"], act=batch["act"],
                    deterministic=True)
                ratio = jnp.exp(logp - batch["logp"])
                adv = batch["adv"]
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
                clipped = jnp.clip(ratio, 1 - cfg.clip_ratio,
                                   1 + cfg.clip_ratio)
                pg_loss = -jnp.mean(jnp.minimum(ratio * adv,
                                                clipped * adv))
                v_loss = jnp.mean((v - batch["ret"]) ** 2)
                mu, std = pi
                ent = jnp.mean(jnp.sum(
                    jnp.log(std) + 0.5 * (1 + jnp.log(2 * jnp.pi)),
                    axis=-1))
                loss = (pg_loss + cfg.vf_coef * v_loss
                        - cfg.ent_coef * ent)
                approx_kl = jnp.mean(batch["logp"] - logp)
                return loss, (pg_loss, v_loss, ent, approx_kl)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self._opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        self._act = act
        self._act_det = act_det
        self._update_minibatch = update_minibatch
        self.params = None
        self.opt_state = None

    def init_params(self, example_obs):
        self.rng, sub = jax.random.split(self.rng)
        self.params = self.policy.init(
            {"params": sub}, jnp.asarray(example_obs))["params"]
        self.opt_state = self._opt.init(self.params)

    def collect_rollout(self, obs, buffer):
        """reference ppo.py:123-160."""
        for _ in range(buffer.buffer_size):
            self.rng, sub = jax.random.split(self.rng)
            a, v, logp = self._act(self.params, jnp.asarray(obs), sub)
            a = np.asarray(a)
            next_obs, rew, done, infos = self.env.step(a)
            buffer.store(obs, a, rew, done.astype(np.float32),
                         np.asarray(v), np.asarray(logp))
            obs = next_obs
        _, last_v, _ = self._act(self.params, jnp.asarray(obs), self.rng)
        buffer.compute_returns_and_advantage(np.asarray(last_v))
        return obs

    def update(self, buffer):
        """Minibatch updates with approx-KL early stop
        (reference ppo.py:201-253)."""
        data = buffer.get()
        n = data["obs"].shape[0]
        mb = min(self.config.minibatch_size, n)
        rng = np.random.RandomState(int(self.rng[0]))
        stats = {}
        for it in range(self.config.gradient_steps_per_update):
            idx = rng.randint(0, n, mb)
            batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
            self.params, self.opt_state, loss, aux = (
                self._update_minibatch(self.params, self.opt_state, batch))
            pg, vl, ent, kl = [float(x) for x in aux]
            stats = dict(loss=float(loss), pg_loss=pg, v_loss=vl,
                         entropy=ent, approx_kl=kl, grad_steps=it + 1)
            if abs(kl) > 1.5 * self.config.target_kl:
                break
        return stats

    def evaluate(self, n_episodes=None):
        """reference ppo.py:172-199."""
        if self.eval_env is None:
            return None
        n = n_episodes or self.config.eval_episodes
        rets = []
        for _ in range(n):
            ts = self.eval_env.reset()
            total = 0.0
            from dm_control_tpu.scripts.vec_env import flatten_obs_dict

            obs = flatten_obs_dict(ts.observation)
            while not ts.last():
                a = np.asarray(self._act_det(self.params,
                                             jnp.asarray(obs)[None]))[0]
                ts = self.eval_env.step(a)
                obs = flatten_obs_dict(ts.observation)
                total += float(ts.reward or 0.0)
            rets.append(total)
        return float(np.mean(rets))

    def train(self):
        """reference ppo.py:123-170."""
        cfg = self.config
        obs = self.env.reset()
        if self.params is None:
            self.init_params(obs)
        n_envs = self.env.num_envs
        steps = max(1, cfg.steps_per_epoch // n_envs)
        buffer = PPOBuffer(obs.shape[1],
                           np.asarray(self.env.step_sample_action()).shape[-1]
                           if hasattr(self.env, "step_sample_action")
                           else self._action_dim(obs),
                           n_envs, steps, cfg.gamma, cfg.lam)
        history = []
        for epoch in range(cfg.max_epochs):
            t0 = time.time()
            obs = self.collect_rollout(obs, buffer)
            stats = self.update(buffer)
            stats["epoch"] = epoch
            stats["mean_reward"] = float(buffer.rewards.mean())
            stats["time"] = time.time() - t0
            history.append(stats)
            print(f"epoch {epoch}: reward/step "
                  f"{stats['mean_reward']:.4f} loss {stats['loss']:.4f} "
                  f"kl {stats['approx_kl']:.4f} "
                  f"({stats['grad_steps']} steps, {stats['time']:.1f}s)")
        return history

    def _action_dim(self, obs):
        self.rng, sub = jax.random.split(self.rng)
        a, _, _ = self._act(self.params, jnp.asarray(obs), sub)
        return np.asarray(a).shape[-1]
