"""Builds an HDF5 BC dataset by replaying saved action files.

Reference: dm_control/scripts/create_dataset.py — scrape job dirs for
`opt_acts_*.npy` + stdout metadata (:23-48,109-123), replay actions to
collect observables (`run_episode` :84-107), concatenate episodes and
write HDF5 (`create_dataset` :125-182).

Usage:
    python -m dm_control_tpu.scripts.create_dataset \
        --input_dirs=<dir,...> --output_path=out.hdf5
"""

from __future__ import annotations

import glob
import os

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_list("input_dirs", ".", "Directories with opt_acts_*.npy.")
flags.DEFINE_string("output_path", "trajectory_dataset.hdf5",
                    "Output HDF5 path.")
flags.DEFINE_string("domain", "cartpole", "Suite domain to replay in.")
flags.DEFINE_string("task", "swingup", "Suite task to replay in.")
flags.DEFINE_integer("seed", 0, "Env seed used when the actions were "
                     "optimized.")


def run_episode(env, actions):
    """Replays actions, returns (observables dict of arrays, rewards)
    (reference create_dataset.py:84-107)."""
    ts = env.reset()
    obs_rows = {k: [np.atleast_1d(np.asarray(v, np.float32)).ravel()]
                for k, v in ts.observation.items()}
    rewards = []
    for a in actions:
        ts = env.step(a)
        for k, v in ts.observation.items():
            obs_rows[k].append(
                np.atleast_1d(np.asarray(v, np.float32)).ravel())
        rewards.append(float(ts.reward or 0.0))
        if ts.last():
            break
    n = len(rewards)
    obs = {k: np.stack(v[:n]) for k, v in obs_rows.items()}
    return obs, np.asarray(rewards)


def gather_action_files(input_dirs):
    """reference create_dataset.py:109-123."""
    files = []
    for d in input_dirs:
        files.extend(sorted(glob.glob(os.path.join(d, "opt_acts_*.npy"))))
    return files


def create_dataset(make_env, action_files, output_path):
    """Replays every action file and writes the HDF5 dataset
    (reference create_dataset.py:125-182)."""
    from dm_control_tpu.scripts.dataset import write_h5

    all_obs, all_acts, all_dones, all_rewards = {}, [], [], []
    for path in action_files:
        actions = np.load(path)
        env = make_env(path)
        obs, rewards = run_episode(env, actions)
        n = len(rewards)
        for k, v in obs.items():
            all_obs.setdefault(k, []).append(v)
        all_acts.append(np.asarray(actions[:n], np.float32))
        dones = np.zeros(n, bool)
        dones[-1] = True
        all_dones.append(dones)
        all_rewards.append(rewards)
        print(f"{os.path.basename(path)}: {n} steps, "
              f"return {rewards.sum():.3f}")
    write_h5(output_path,
             {k: np.concatenate(v) for k, v in all_obs.items()},
             np.concatenate(all_acts), np.concatenate(all_dones),
             np.concatenate(all_rewards))
    print(f"wrote {output_path}")


def main(argv):
    del argv
    from dm_control_tpu import suite

    def make_env(path):
        return suite.load(FLAGS.domain, FLAGS.task,
                          task_kwargs={"random": FLAGS.seed})

    files = gather_action_files(FLAGS.input_dirs)
    if not files:
        raise SystemExit("no opt_acts_*.npy found in input_dirs")
    create_dataset(make_env, files, FLAGS.output_path)


if __name__ == "__main__":
    app.run(main)
