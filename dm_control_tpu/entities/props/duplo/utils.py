"""Duplo snap-fit measurement utilities
(reference: dm_control/entities/props/duplo/utils.py:24-91).

Used by tests and by autotune.py to measure the force needed to pull
two engaged bricks apart.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.entities.props.duplo import BRICK_HEIGHT
from dm_control_tpu.physics.physics import Physics


def stack_bricks(top_brick, bottom_brick):
    """Stacks two bricks: bottom fixed to the arena, top free, engaged
    one brick-height above.  Returns (arena, top attachment frame)."""
    arena = composer.Arena()
    arena.attach(bottom_brick)
    frame = arena.add_free_entity(top_brick)
    frame.attrib["pos"] = f"0 0 {BRICK_HEIGHT}"
    return arena, frame


def measure_separation_force(top_brick, bottom_brick, min_force=0.0,
                             max_force=20.0, tolerance=0.01,
                             time_limit=0.5, height_threshold=1e-3):
    """Bisects for the vertical force (N) that separates the bricks.

    Gravity is disabled so the measurement reads pure snap strength;
    because the contact model is soft, a longer ``time_limit`` lets the
    bricks creep apart under smaller forces, giving lower estimates.
    """
    arena, frame = stack_bricks(top_brick, bottom_brick)
    root = arena.mjcf_model
    option = root.first("option") or root.add("option")
    option.attrib["gravity"] = "0 0 0"
    physics = Physics.from_mjcf_model(root)
    binding = physics.bind(frame)
    n_steps = int(round(time_limit / physics.model.opt.timestep))

    def separates(force):
        physics.reset()
        initial_height = float(binding.xpos[2])
        wrench = np.zeros(6)
        wrench[2] = force
        binding.xfrc_applied = wrench
        for _ in range(n_steps):
            physics.step()
            if float(binding.xpos[2]) - initial_height > height_threshold:
                return True
        return False

    while min_force > 0 and separates(min_force):
        min_force *= 0.5
    while not separates(max_force):
        max_force *= 2.0
        if max_force > 1e4:
            raise RuntimeError("bricks never separate: bad geometry?")

    lo, hi = min_force, max_force
    while hi - lo > tolerance:
        mid = 0.5 * (lo + hi)
        if separates(mid):
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)
