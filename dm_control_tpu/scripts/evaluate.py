"""Policy / open-loop evaluation tools.

Reference: dm_control/scripts/evaluate.py — observation assembly
(:23-38), policy rollouts with context-window action prediction
(`run_episode` :87-118), open-loop reference-action replay
(`run_episode_with_reference_actions` :120-144, `validate_reference_
actions` :73), model loading from config+checkpoint (:149-175),
MSE + return metrics (`evaluate` :177-191) and `comprehensive_eval`
over saved clip dirs (:193-222).
"""

from __future__ import annotations

import glob
import os

import flax
import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.scripts.model import (FFConfig, FFNet, GPT, GPTConfig)


def observables_sorted(observation):
    """Sorted observable keys (reference evaluate.py:23-26)."""
    return sorted(observation.keys())


def build_observation(time_step, observables=None):
    """Flattens selected observables in sorted-key order
    (reference evaluate.py:28-38)."""
    obs = time_step.observation
    keys = observables or observables_sorted(obs)
    parts = [np.atleast_1d(np.asarray(obs[k], np.float32)).ravel()
             for k in keys]
    return np.concatenate(parts)


def load_model(config_path, model_path):
    """Rebuilds model + params from saved config/checkpoint
    (reference evaluate.py:149-175)."""
    try:
        config = GPTConfig.from_json(config_path)
        model = GPT(config)
    except TypeError:
        config = FFConfig.from_json(config_path)
        model = FFNet(config)
    rng = jax.random.PRNGKey(0)
    T = config.block_size
    example = jnp.zeros((1, T, config.obs_size))
    if isinstance(model, FFNet):
        example = jnp.zeros((1, config.obs_size))
    params = model.init({"params": rng, "dropout": rng}, example)["params"]
    with open(model_path, "rb") as f:
        params = flax.serialization.from_bytes(params, f.read())
    return model, params, config


def policy_fn(model, params, config):
    """Context-window action prediction: feed the last ``block_size``
    observations, take the action at the final position
    (reference evaluate.py:87-118)."""
    apply = jax.jit(lambda p, o: model.apply({"params": p}, o)[0])

    if isinstance(model, FFNet):
        def policy(history):
            obs = jnp.asarray(history[-1])[None]
            return np.asarray(apply(params, obs)[0])
        return policy

    def policy(history):
        ctx = history[-config.block_size:]
        obs = jnp.asarray(np.stack(ctx))[None]
        return np.asarray(apply(params, obs)[0, -1])
    return policy


def run_episode(env, model, params, config, reference_actions=None,
                context_steps=0, observables=None):
    """Rolls out the policy; the first ``context_steps`` actions come
    open-loop from ``reference_actions`` to build context
    (reference evaluate.py:87-118).  Returns (return, predicted_actions,
    reference_mse)."""
    policy = policy_fn(model, params, config)
    ts = env.reset()
    history = [build_observation(ts, observables)]
    total, preds, errs = 0.0, [], []
    t = 0
    while not ts.last():
        a = policy(history)
        if reference_actions is not None and t < len(reference_actions):
            ref = np.asarray(reference_actions[t])
            errs.append(float(np.mean((a - ref) ** 2)))
            if t < context_steps:
                a = ref
        ts = env.step(a)
        total += float(ts.reward or 0.0)
        preds.append(a)
        history.append(build_observation(ts, observables))
        t += 1
        if reference_actions is not None and t >= len(reference_actions):
            break
    mse = float(np.mean(errs)) if errs else None
    return total, np.asarray(preds), mse


def run_episode_with_reference_actions(env, reference_actions):
    """Open-loop replay (reference evaluate.py:120-144).  Returns
    (return, observations)."""
    ts = env.reset()
    total, obs = 0.0, [build_observation(ts)]
    for a in reference_actions:
        ts = env.step(a)
        total += float(ts.reward or 0.0)
        obs.append(build_observation(ts))
        if ts.last():
            break
    return total, np.asarray(obs)


def validate_reference_actions(env, reference_actions, expected_return,
                               tol=1e-3):
    """Checks open-loop replay reproduces the recorded return
    (reference evaluate.py:73-85)."""
    total, _ = run_episode_with_reference_actions(env, reference_actions)
    return abs(total - expected_return) <= tol, total


def evaluate(env, model, params, config, reference_actions=None,
             context_steps=0, observables=None):
    """Returns {policy_return, reference_return, action_mse}
    (reference evaluate.py:177-191)."""
    out = {}
    if reference_actions is not None:
        ref_ret, _ = run_episode_with_reference_actions(
            env, reference_actions)
        out["reference_return"] = ref_ret
    ret, _, mse = run_episode(env, model, params, config,
                              reference_actions, context_steps,
                              observables)
    out["policy_return"] = ret
    out["action_mse"] = mse
    return out


def comprehensive_eval(eval_dir, make_env, model, params, config,
                       context_steps=32):
    """Evaluates over every saved `opt_acts_*.npy`
    (reference evaluate.py:193-222)."""
    results = {}
    for path in sorted(glob.glob(os.path.join(eval_dir, "opt_acts_*.npy"))):
        ref = np.load(path)
        env = make_env(path)
        results[os.path.basename(path)] = evaluate(
            env, model, params, config, reference_actions=ref,
            context_steps=context_steps)
    return results
