"""Interactive manipulation-task explorer
(reference: dm_control/manipulation/explore.py).

    python -m dm_control_tpu.manipulation.explore \
        --environment_name=reach_site_features
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

from dm_control_tpu import manipulation, viewer

flags.DEFINE_enum("environment_name", None, list(manipulation.ALL),
                  "Optional name of an environment to load. If "
                  "unspecified a prompt appears.")
FLAGS = flags.FLAGS


def prompt_environment_name(prompt, values):
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
        print("\n".join(manipulation.ALL))
        name = prompt_environment_name(
            "Please select an environment name: ", manipulation.ALL)
    env = manipulation.load(name)
    spec = env.action_spec()
    rng = np.random.RandomState(0)

    def random_policy(time_step):
        del time_step
        return rng.uniform(spec.minimum, spec.maximum, spec.shape)

    viewer.launch(env, policy=random_policy)


if __name__ == "__main__":
    app.run(main)
