"""Interactive suite explorer (reference: dm_control/suite/explore.py).

    python -m dm_control_tpu.suite.explore \
        --environment_name=cartpole.swingup
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

from dm_control_tpu import suite, viewer
from dm_control_tpu.suite.wrappers import action_noise

_ALL_NAMES = [".".join(dt) for dt in suite.ALL_TASKS]

flags.DEFINE_enum("environment_name", None, _ALL_NAMES,
                  "Optional 'domain_name.task_name' pair specifying the "
                  "environment to load. If unspecified a prompt appears.")
flags.DEFINE_bool("timeout", True,
                  "Whether episodes should have a time limit.")
flags.DEFINE_float("action_noise", 0.0,
                   "Std of Gaussian action noise as a fraction of each "
                   "action dimension's range (0 = none).")
FLAGS = flags.FLAGS


def prompt_environment_name(prompt, values):
    """reference explore.py:55-63."""
    name = None
    while not name:
        name = input(prompt)
        if name not in values:
            print(f"{name!r} is not a valid environment name.")
            name = None
    return name


def main(argv):
    del argv
    name = FLAGS.environment_name
    if name is None:
        print("\n".join(_ALL_NAMES))
        name = prompt_environment_name(
            "Please select an environment name: ", _ALL_NAMES)
    domain, task = name.split(".")
    task_kwargs = {}
    if not FLAGS.timeout:
        task_kwargs["time_limit"] = float("inf")
    env = suite.load(domain, task, task_kwargs=task_kwargs)
    if FLAGS.action_noise > 0:
        env = action_noise.Wrapper(env, scale=FLAGS.action_noise)

    spec = env.action_spec()
    rng = np.random.RandomState(0)

    def random_policy(time_step):
        del time_step
        return rng.uniform(spec.minimum, spec.maximum, spec.shape)

    viewer.launch(env, policy=random_policy)


if __name__ == "__main__":
    app.run(main)
