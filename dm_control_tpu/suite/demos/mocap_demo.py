"""AMC mocap playback demo on humanoid_CMU
(reference: dm_control/suite/demos/mocap_demo.py).

    python -m dm_control_tpu.suite.demos.mocap_demo --filename=clip.amc
"""

from __future__ import annotations

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("filename", None, "amc file to be converted.")
flags.DEFINE_integer("max_num_frames", 90,
                     "Maximum number of frames for playback.")


def main(unused_argv):
    from dm_control_tpu import suite
    from dm_control_tpu.suite.utils import parse_amc

    env = suite.load("humanoid_CMU", "stand")
    dt = float(np.asarray(env.physics.model.opt.timestep))

    if FLAGS.filename is None:
        raise SystemExit("--filename required (a CMU .amc clip; see "
                         "mocap.cs.cmu.edu)")
    converted = parse_amc.convert(FLAGS.filename, env.physics, dt)
    n = min(converted.qpos.shape[1] - 1, FLAGS.max_num_frames)
    print(f"clip: {converted.qpos.shape[1]} frames at dt={dt}")

    env.reset()
    for i in range(n):
        with env.physics.reset_context():
            env.physics.set_state(np.concatenate(
                [converted.qpos[:, i], converted.qvel[:, i]]))
        h = float(env.physics.named_field("xpos", "head")[2]) \
            if "head" in env.physics.model.names.body else 0.0
        if i % 30 == 0:
            print(f"frame {i}: head height {h:.3f}")
    print("playback done")


if __name__ == "__main__":
    app.run(main)
