"""Mocap tracking reward zoo
(reference: dm_control/locomotion/tasks/reference_pose/rewards.py:73-224).
"""

from __future__ import annotations

import collections

import numpy as np

RewardFnOutput = collections.namedtuple(
    "RewardFnOutput", ["reward", "debug", "reward_terms"])


def sort_dict(d):
    return collections.OrderedDict(sorted(d.items()))


def compute_squared_differences(walker_features, reference_features,
                                exclude_keys=()):
    """Mean squared differences per feature
    (reference rewards.py helper)."""
    out = {}
    for key in walker_features:
        if key in exclude_keys or key not in reference_features:
            continue
        a = np.asarray(walker_features[key], dtype=float)
        b = np.asarray(reference_features[key], dtype=float)
        if a.shape != b.shape:
            # feature absent on one side (e.g. reference without
            # appendage data): contributes zero error
            out[key] = 0.0
            continue
        diff = a - b
        out[key] = float(np.mean(diff ** 2)) if diff.size else 0.0
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
    (reference rewards.py multi_term_pose_reward_fn)."""
    d = compute_squared_differences(walker_features, reference_features)
    com = 0.1 * np.exp(-10 * d.get("center_of_mass", 0.0))
    joints_velocity = 1.0 * np.exp(-0.1 * d.get("joints_velocity", 0.0))
    appendages = 0.15 * np.exp(-40.0 * d.get("appendages", 0.0))
    body_quaternions = 0.65 * np.exp(-2 * d.get("body_quaternions", 0.0))
    terms = {
        "center_of_mass": com,
        "joints_velocity": joints_velocity,
        "appendages": appendages,
        "body_quaternions": body_quaternions,
    }
    return RewardFnOutput(reward=sum(terms.values()), debug=terms,
                          reward_terms=sort_dict(terms))


def comic_reward_fn(termination_error, termination_error_threshold,
                    walker_features, reference_features, **unused_kwargs):
    """0.5 * termination + 0.5 * multi-term pose (CoMic; reference
    rewards.py comic_reward_fn)."""
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
    d = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(reward=d.get("center_of_mass", 0.0), debug=d,
                          reward_terms=None)


def quat_reward_fn(termination_error, termination_error_threshold,
                   walker_features, reference_features, **unused_kwargs):
    d = compute_squared_differences(walker_features, reference_features)
    return RewardFnOutput(reward=d.get("body_quaternions", 0.0), debug=d,
                          reward_terms=None)


def kumquat_reward_fn(termination_error, termination_error_threshold,
                      walker_features, reference_features, **unused_kwargs):
    """termination x pose mixture (reference's 'kumquat' variant)."""
    term = termination_reward_fn(termination_error,
                                 termination_error_threshold)
    mt = multi_term_pose_reward_fn(walker_features, reference_features)
    return RewardFnOutput(reward=term.reward * mt.reward,
                          debug=dict(term.debug, **mt.debug),
                          reward_terms=None)


_REWARD_FNS = {
    "termination_reward": termination_reward_fn,
    "multi_term_pose": multi_term_pose_reward_fn,
    "comic": comic_reward_fn,
    "com": com_reward_fn,
    "quat": quat_reward_fn,
    "kumquat": kumquat_reward_fn,
    "debug": debug,
}


def get_reward(key: str):
    return _REWARD_FNS[key]
