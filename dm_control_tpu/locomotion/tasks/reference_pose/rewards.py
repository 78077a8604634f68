"""Mocap tracking reward zoo
(reference: dm_control/locomotion/tasks/reference_pose/rewards.py:22-235).

All functions are written in jax.numpy over feature dicts, so the SAME
implementation computes the host composer reward and the batched-path
reward (host/batch parity by construction).  Semantics mirror the
reference exactly: squared differences are SUMS over the feature,
quaternion-valued features use the bounded quaternion distance, and the
named reward functions use the reference's coefficients.
"""

from __future__ import annotations

import collections

import jax.numpy as jnp

RewardFnOutput = collections.namedtuple(
    "RewardFnOutput", ["reward", "debug", "reward_terms"])


def sort_dict(d):
    return collections.OrderedDict(sorted(d.items()))


def bounded_quat_dist(source, target):
    """Quaternion distance limited to a max of pi: min of d(source,
    target) and d(source, -target).  Supports batched inputs
    (reference rewards.py:26-46).

    For unit quaternions the reference's ||quat_log(s * t^-1)|| equals
    arccos(w(s * t^-1)) = arccos(<s, t>), and the min over +-target is
    arccos(|<s, t>|) — computed in that closed form here so the function
    traces under jit (the reference's numpy quat_log path does not)."""
    source = jnp.asarray(source)
    target = jnp.asarray(target, source.dtype)
    source = source / jnp.linalg.norm(source, axis=-1, keepdims=True)
    target = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    dot = jnp.abs(jnp.sum(source * target, axis=-1))
    return jnp.arccos(jnp.clip(dot, 0.0, 1.0))


def compute_squared_differences(walker_features, reference_features,
                                exclude_keys=()):
    """Summed squared differences per feature (reference rewards.py:53-70):
    plain features use sum((w - r)**2); keys containing 'quaternions'
    use summed squared bounded quaternion distances; keys containing
    'quaternion' (singular) use the squared bounded distance."""
    out = {}
    for k in walker_features:
        if k in exclude_keys or k not in reference_features:
            continue
        w = jnp.asarray(walker_features[k])
        r = jnp.asarray(reference_features[k])
        if "quaternion" not in k:
            out[k] = jnp.sum((w - r) ** 2)
        elif "quaternions" in k:
            dists = bounded_quat_dist(w, r)
            out[k] = jnp.sum(dists ** 2)
        else:
            out[k] = jnp.squeeze(bounded_quat_dist(w, r) ** 2)
    return out


def termination_reward_fn(termination_error, termination_error_threshold,
                          **unused_kwargs):
    """1 - error/threshold, in [0, 1] given the termination rule
    (reference rewards.py:73)."""
    debug = {"termination_error": termination_error,
             "termination_error_threshold": termination_error_threshold}
    reward = 1 - termination_error / termination_error_threshold
    return RewardFnOutput(reward=reward, debug=debug,
                          reward_terms=sort_dict({"termination": reward}))


def debug(reference_features, walker_features, **unused_kwargs):
    terms = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(reward=0.0, debug=terms, reward_terms=None)


def multi_term_pose_reward_fn(walker_features, reference_features,
                              **unused_kwargs):
    """com / body-quaternion / joint-velocity / appendage mixture
    (reference rewards.py:104-119)."""
    d = compute_squared_differences(walker_features, reference_features)
    terms = {
        "center_of_mass": 0.1 * jnp.exp(-10 * d["center_of_mass"]),
        "joints_velocity": 1.0 * jnp.exp(-0.1 * d["joints_velocity"]),
        "appendages": 0.15 * jnp.exp(-40.0 * d["appendages"]),
        "body_quaternions": 0.65 * jnp.exp(-2 * d["body_quaternions"]),
    }
    return RewardFnOutput(reward=sum(terms.values()), debug=terms,
                          reward_terms=sort_dict(terms))


def comic_reward_fn(termination_error, termination_error_threshold,
                    walker_features, reference_features, **unused_kwargs):
    """0.5 * termination + 0.5 * multi-term pose (CoMic, Hasenclever et
    al. 2020; reference rewards.py:123-156)."""
    term = termination_reward_fn(termination_error,
                                 termination_error_threshold)
    mt = multi_term_pose_reward_fn(walker_features, reference_features)
    debug_terms = dict(term.debug)
    debug_terms.update(mt.debug)
    reward_terms = {k: 0.5 * v for k, v in term.reward_terms.items()}
    reward_terms.update({k: 0.5 * v for k, v in mt.reward_terms.items()})
    return RewardFnOutput(
        reward=0.5 * term.reward + 0.5 * mt.reward,
        debug=debug_terms, reward_terms=sort_dict(reward_terms))


def com_reward_fn(termination_error, termination_error_threshold,
                  walker_features, reference_features, **unused_kwargs):
    """Center-of-mass-only cost (reference rewards.py:159-166)."""
    d = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(reward=d["center_of_mass"], debug=d,
                          reward_terms=None)


def quat_reward_fn(termination_error, termination_error_threshold,
                   walker_features, reference_features, **unused_kwargs):
    """Body-quaternion-only cost (reference rewards.py:169-176)."""
    d = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(reward=d["body_quaternions"], debug=d,
                          reward_terms=None)


def kumquat_reward_fn(termination_error, termination_error_threshold,
                      walker_features, reference_features, **unused_kwargs):
    """3*com + body-quaternion cost (reference rewards.py:179-186)."""
    d = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(
        reward=3 * d["center_of_mass"] + d["body_quaternions"],
        debug=d, reward_terms=None)


def supreme_reward_fn(termination_error, termination_error_threshold,
                      walker_features, reference_features, **unused_kwargs):
    """Weighted multi-feature cost (reference rewards.py:189-210)."""
    d = compute_squared_differences(walker_features, reference_features)
    cost = (18 * termination_error
            + 416.0 * d["center_of_mass"]
            + 7.4 * d["appendages"]
            + 0.0045 * d["joints_velocity"]
            + 1.25 * d["body_quaternions"])
    return RewardFnOutput(reward=cost, debug=d, reward_terms=None)


def termination_cost_fn(termination_error, termination_error_threshold,
                        **unused_kwargs):
    """Raw termination error as cost (reference rewards.py:213-221)."""
    debug = {"termination_error": termination_error,
             "termination_error_threshold": termination_error_threshold}
    return RewardFnOutput(reward=termination_error, debug=debug,
                          reward_terms=sort_dict(
                              {"termination": termination_error}))


_REWARD_FNS = {
    "termination_reward": termination_reward_fn,
    "multi_term_pose_reward": multi_term_pose_reward_fn,
    # alias kept for code written against the r2 API
    "multi_term_pose": multi_term_pose_reward_fn,
    "comic": comic_reward_fn,
    "com": com_reward_fn,
    "quat": quat_reward_fn,
    "kumquat": kumquat_reward_fn,
    "supreme": supreme_reward_fn,
    "termination": termination_cost_fn,
    "debug": debug,
}


def get_reward(key: str):
    return _REWARD_FNS[key]
