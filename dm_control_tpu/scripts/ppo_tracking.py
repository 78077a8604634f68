"""PPO mocap-tracking driver
(reference: dm_control/scripts/ppo_tracking.py:19-110).

Builds the multi-clip mocap tracking task (locomotion/tasks/
reference_pose/tracking.py), wraps it behind a VecEnv, and trains the
ActorCritic with PPOTrainer.  Mirrors the reference's `build_env` /
`EnvWrap` (obs-concat wrapper, ppo_tracking.py:19-66) with DummyVecEnv
instead of 8 subprocess workers — composer envs are host-hooked; the
fully-compiled path for suite tasks is dm_control_tpu.rl.ppo.

    python -m dm_control_tpu.scripts.ppo_tracking --max_epochs=2
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_integer("n_envs", 4, "Parallel environments.")
flags.DEFINE_integer("max_epochs", 100, "Training epochs.")
flags.DEFINE_integer("steps_per_epoch", 2048, "Env steps per epoch.")
flags.DEFINE_string("clip_name", "synthetic_walk", "Mocap clip id.")
flags.DEFINE_integer("seed", 42, "Seed.")
flags.DEFINE_list("observables", "walker/joints_pos,walker/joints_vel",
                  "Observables defining the task.")


def build_env(clip_name="synthetic_walk", seed=42, time_limit=8.0):
    """reference ppo_tracking.py:19-45.

    Uses the real CMU h5 when present (CMU_MOCAP_DIR / ~/.dm_control,
    see mocap/loader.cmu_mocap_path); falls back to a synthetic walking
    clip — this container has no egress to fetch the dataset."""
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.arenas import floors
    from dm_control_tpu.locomotion.mocap import loader
    from dm_control_tpu.locomotion.mocap.types import ClipCollection
    from dm_control_tpu.locomotion.tasks.reference_pose import tracking
    from dm_control_tpu.locomotion.walkers.cmu_humanoid import CMUHumanoid

    walker = CMUHumanoid()
    arena = floors.Floor()
    try:
        trajectories = loader.cmu_mocap_path()
    except FileNotFoundError:
        nq = 7 + len(walker.observable_joint_names)
        trajectories = {clip_name: loader.synthetic_walking_trajectory(
            nq=nq, nv=nq - 1, num_steps=240)}
    task = tracking.MultiClipMocapTracking(
        walker=walker, arena=arena,
        ref_path_or_trajectories=trajectories,
        dataset=ClipCollection(ids=(clip_name,)),
        ref_steps=(1, 2, 3, 4, 5),
        termination_error_threshold=50.0,
        always_init_at_clip_start=True)
    return composer.Environment(
        task=task, time_limit=time_limit,
        random_state=np.random.RandomState(seed))


class EnvWrap:
    """Commits to specific observables (reference ppo_tracking.py:47-66);
    presents the dm_env as a flat-obs gym-style env for VecEnv."""

    def __init__(self, env, observables):
        self.env = env
        self.observables = list(observables)

    def reset(self):
        return self._obs(self.env.reset())

    def _obs(self, time_step):
        parts = []
        for o in self.observables:
            v = np.asarray(time_step.observation[o], np.float32)
            parts.append(v.ravel())
        return np.concatenate(parts)

    def step(self, action):
        ts = self.env.step(action)
        return ts

    def action_spec(self):
        return self.env.action_spec()


def main(argv):
    del argv
    from dm_control_tpu.scripts.model import ActorCritic
    from dm_control_tpu.scripts.ppo import PPOTrainer, PPOTrainerConfig
    from dm_control_tpu.scripts.vec_env import DummyVecEnv

    def make():
        return build_env(FLAGS.clip_name, FLAGS.seed)

    venv = DummyVecEnv([make for _ in range(FLAGS.n_envs)])
    eval_env = build_env(FLAGS.clip_name, FLAGS.seed + 1)
    action_size = eval_env.action_spec().shape[0]
    policy = ActorCritic(action_size=action_size)
    config = PPOTrainerConfig(max_epochs=FLAGS.max_epochs,
                              steps_per_epoch=FLAGS.steps_per_epoch,
                              seed=FLAGS.seed)
    trainer = PPOTrainer(policy, venv, eval_env, config)
    trainer.train()
    print("eval return:", trainer.evaluate())


if __name__ == "__main__":
    app.run(main)
