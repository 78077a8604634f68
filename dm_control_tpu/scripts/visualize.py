"""Playback of saved action files through the viewer
(reference: dm_control/scripts/visualize.py).

    python -m dm_control_tpu.scripts.visualize \
        --ref_actions_path=opt_acts_0.npy --domain=cartpole --task=swingup
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("ref_actions_path", "opt_acts_0.npy",
                    "Saved actions to play back.")
flags.DEFINE_string("domain", "cartpole", "Suite domain.")
flags.DEFINE_string("task", "swingup", "Suite task.")
flags.DEFINE_integer("seed", 0, "Env seed.")


def main(argv):
    del argv
    from dm_control_tpu import suite, viewer

    actions = np.load(FLAGS.ref_actions_path)
    state = {"t": 0}

    def policy(time_step):
        t = state["t"]
        state["t"] = t + 1
        if t < len(actions):
            return actions[t]
        return np.zeros_like(actions[0])

    def loader():
        return suite.load(FLAGS.domain, FLAGS.task,
                          task_kwargs={"random": FLAGS.seed})

    viewer.launch(loader, policy=policy)


if __name__ == "__main__":
    app.run(main)
