"""Soccer explorer CLI (reference: dm_control/locomotion/soccer/
explore.py).

    python -m dm_control_tpu.locomotion.soccer.explore --team_size=2
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

from dm_control_tpu import viewer
from dm_control_tpu.locomotion import soccer

flags.DEFINE_integer("team_size", 2, "Players per team (1-11).")
flags.DEFINE_float("time_limit", 45.0, "Episode time limit in seconds.")
flags.DEFINE_enum("walker_type", "BOXHEAD",
                  [t.name for t in soccer.WalkerType],
                  "Walker type to instantiate.")
flags.DEFINE_bool("terminate_on_goal", True,
                  "End the episode when a goal is scored.")
FLAGS = flags.FLAGS


def main(unused_argv):
    env = soccer.load(
        team_size=FLAGS.team_size,
        time_limit=FLAGS.time_limit,
        walker_type=soccer.WalkerType[FLAGS.walker_type],
        terminate_on_goal=FLAGS.terminate_on_goal)

    def random_policy(time_step):
        del time_step
        specs = env.task.action_spec_per_player(env.physics)
        return [np.random.uniform(s.minimum, s.maximum, s.shape)
                for s in specs]

    viewer.launch(env, policy=random_policy)


if __name__ == "__main__":
    app.run(main)
