"""Locomotion examples explorer CLI
(reference: dm_control/locomotion/examples/explore.py).

    python -m dm_control_tpu.locomotion.examples.explore \
        --environment=cmu_humanoid_run_gaps
"""

from __future__ import annotations

from absl import app, flags

from dm_control_tpu import viewer
from dm_control_tpu.locomotion.examples import basic

_LOADERS = {name: getattr(basic, name) for name in dir(basic)
            if name.startswith(("cmu_humanoid_", "rodent_"))}

flags.DEFINE_enum("environment", "cmu_humanoid_run_gaps",
                  sorted(_LOADERS), "Which example environment to load.")
FLAGS = flags.FLAGS


def main(unused_argv):
    viewer.launch(environment_loader=_LOADERS[FLAGS.environment])


if __name__ == "__main__":
    app.run(main)
