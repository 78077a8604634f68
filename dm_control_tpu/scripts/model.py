"""Behavioral-cloning / RL model family, TPU-native (flax).

Reference: dm_control/scripts/model.py — minGPT-style causal transformer
(`CausalSelfAttention`/`Block`/`GPT`, model.py:50,94,196), Gaussian policy
heads (`GaussianHead` :115, `SquashedGaussianHead` :151), `FFNet` MLP BC
baseline (:326) and `ActorCritic` (:360), with JSON-serializable configs
(:27-41).

TPU design: attention/MLP as fused einsum matmuls (MXU path); causal
masking via static triangular mask on a fixed block_size (static shapes —
one compiled program per config); dropout threaded through flax RNG
collections; parameters live in a flax pytree so the trainer can shard
them with jax.sharding and the whole forward/backward jits.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOG_STD_MAX = 2.0
LOG_STD_MIN = -20.0


@dataclasses.dataclass
class GPTConfig:
    """Config (reference model.py:21-41); JSON round-trippable."""

    obs_size: int
    action_size: int
    block_size: int
    n_layer: int = 8
    n_head: int = 8
    n_embd: int = 512
    embd_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.1

    def to_json(self, output_fname):
        with open(output_fname, "w") as f:
            f.write(json.dumps(dataclasses.asdict(self)))

    @staticmethod
    def from_json(fname):
        with open(fname) as f:
            return GPTConfig(**json.loads(f.read()))


def GPT1Config(obs_size, action_size, block_size, **kw):
    """reference model.py:44-48."""
    kw.setdefault("n_layer", 12)
    kw.setdefault("n_head", 12)
    kw.setdefault("n_embd", 768)
    return GPTConfig(obs_size, action_size, block_size, **kw)


@dataclasses.dataclass
class FFConfig:
    """reference model.py:305-324."""

    obs_size: int
    action_size: int
    block_size: int = 1
    hidden_size: int = 1024

    def __post_init__(self):
        assert self.block_size == 1, "FFNet requires block_size=1."

    def to_json(self, output_fname):
        with open(output_fname, "w") as f:
            f.write(json.dumps(dataclasses.asdict(self)))

    @staticmethod
    def from_json(fname):
        with open(fname) as f:
            return FFConfig(**json.loads(f.read()))


# -- policy heads -----------------------------------------------------------


class GaussianHead(nn.Module):
    """Mean head + state-independent log-std (reference model.py:115-145)."""

    act_dim: int

    @nn.compact
    def __call__(self, x, act=None, deterministic=True, rng=None):
        mu = nn.Dense(self.act_dim, use_bias=False, name="mu_layer")(x)
        log_std = self.param(
            "log_std", lambda k: -0.5 * jnp.ones(self.act_dim, jnp.float32))
        std = jnp.exp(log_std)
        if deterministic or rng is None:
            pi_action = mu
        else:
            pi_action = mu + std * jax.random.normal(rng, mu.shape)
        a = act if act is not None else pi_action
        logp = jnp.sum(
            -0.5 * ((a - mu) / std) ** 2 - log_std
            - 0.5 * math.log(2 * math.pi), axis=-1)
        return (mu, std), pi_action, logp


class SquashedGaussianHead(nn.Module):
    """Tanh-squashed Gaussian (reference model.py:151-193; SAC-style
    log-prob correction, arXiv 1801.01290 App. C)."""

    act_dim: int
    act_limit: float = 1.0

    @nn.compact
    def __call__(self, x, act=None, deterministic=False, with_logprob=True,
                 rng=None):
        mu = nn.Dense(self.act_dim, use_bias=False, name="mu_layer")(x)
        log_std = nn.Dense(self.act_dim, use_bias=False,
                           name="log_std_layer")(x)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        std = jnp.exp(log_std)

        if act is None:
            if deterministic or rng is None:
                pi_action = mu
            else:
                pi_action = mu + std * jax.random.normal(rng, mu.shape)
        else:
            pi_action = act

        logp_pi = None
        if with_logprob:
            logp_pi = jnp.sum(
                -0.5 * ((pi_action - mu) / std) ** 2 - log_std
                - 0.5 * math.log(2 * math.pi), axis=-1)
            logp_pi -= jnp.sum(
                2.0 * (math.log(2.0) - pi_action
                       - jax.nn.softplus(-2.0 * pi_action)), axis=-1)

        if act is None:
            pi_action = self.act_limit * jnp.tanh(pi_action)
        return pi_action, logp_pi


# -- transformer ------------------------------------------------------------


class CausalSelfAttention(nn.Module):
    """Multi-head causal self-attention (reference model.py:50-91).

    One fused qkv projection einsum + scaled-dot-product with a static
    lower-triangular mask — all MXU matmuls under jit.
    """

    config: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        B, T, C = x.shape
        nh, hs = cfg.n_head, C // cfg.n_head
        qkv = nn.Dense(3 * C, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, nh, hs).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, nh, hs).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, nh, hs).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hs)
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(cfg.attn_pdrop)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        y = nn.Dense(C, name="proj")(y)
        return nn.Dropout(cfg.resid_pdrop)(y, deterministic=deterministic)


class Block(nn.Module):
    """Pre-LN transformer block (reference model.py:94-112)."""

    config: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = x + CausalSelfAttention(cfg, name="attn")(
            nn.LayerNorm(name="ln1")(x), deterministic)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * cfg.n_embd, name="fc")(h)
        h = nn.gelu(h)
        h = nn.Dense(cfg.n_embd, name="proj")(h)
        h = nn.Dropout(cfg.resid_pdrop)(h, deterministic=deterministic)
        return x + h


class GPT(nn.Module):
    """Causal transformer over observation sequences → action distribution
    (reference model.py:196-302).  forward(obs[B,T,obs_size], targets)
    returns (actions, loss = -mean logp of targets)."""

    config: GPTConfig

    @nn.compact
    def __call__(self, obs, targets=None, deterministic=True, rng=None):
        cfg = self.config
        B, T, D = obs.shape
        assert T <= cfg.block_size, "block size exhausted"
        tok = nn.Dense(cfg.n_embd, name="tok_emb")(obs)
        pos = self.param(
            "pos_emb",
            lambda k: jnp.zeros((1, cfg.block_size, cfg.n_embd)))
        x = tok + pos[:, :T]
        x = nn.Dropout(cfg.embd_pdrop)(x, deterministic=deterministic)
        for i in range(cfg.n_layer):
            x = Block(cfg, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(name="ln_f")(x)
        head = SquashedGaussianHead(cfg.action_size, act_limit=1.0,
                                    name="head")
        actions, logp = head(x, act=targets, deterministic=True, rng=rng)
        loss = None if targets is None else -jnp.mean(logp)
        return actions, loss

    def get_block_size(self):
        return self.config.block_size


class FFNet(nn.Module):
    """MLP BC baseline, MSE loss (reference model.py:326-358)."""

    config: FFConfig

    @nn.compact
    def __call__(self, x, targets=None, deterministic=True, rng=None):
        h = nn.Dense(self.config.hidden_size)(x)
        h = nn.relu(h)
        h = nn.Dense(self.config.hidden_size)(h)
        h = nn.relu(h)
        out = nn.Dense(self.config.action_size)(h)
        loss = None
        if targets is not None:
            loss = jnp.mean((out - targets) ** 2)
        return out, loss


class ActorCritic(nn.Module):
    """SB3-default actor-critic MLP (reference model.py:360-400)."""

    action_size: int
    hidden_size: int = 64

    @nn.compact
    def __call__(self, x, act=None, deterministic=False, rng=None):
        z = nn.Dense(self.hidden_size)(x)
        z = nn.relu(z)
        z = nn.Dense(self.hidden_size)(z)
        z = nn.relu(z)
        v = nn.Dense(self.hidden_size)(x)
        v = nn.relu(v)
        v = nn.Dense(self.hidden_size)(v)
        v = nn.relu(v)
        v = nn.Dense(1)(v)
        pi, a, logp = GaussianHead(self.action_size, name="policy_head")(
            z, act=act, deterministic=deterministic, rng=rng)
        return pi, a, jnp.squeeze(v, -1), logp


def init_model(model, rng, example_obs, example_targets=None):
    """Initializes parameters; returns the params pytree."""
    variables = model.init({"params": rng, "dropout": rng}, example_obs,
                           example_targets)
    return variables["params"]


def count_params(params) -> int:
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)))
