"""Preconfigured locomotion environments
(reference: dm_control/locomotion/examples/basic_cmu_2019.py:34-164 and
basic_rodent_2020.py)."""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu.composer.variation import distributions
from dm_control_tpu.locomotion.arenas import (
    EmptyCorridor, Floor, GapsCorridor, WallsCorridor,
)
from dm_control_tpu.locomotion.tasks import GoToTarget, RunThroughCorridor
from dm_control_tpu.locomotion.walkers.cmu_humanoid import (
    CMUHumanoidPositionControlled,
)


def cmu_humanoid_run_walls(random_state=None):
    """CMU humanoid running through a walls corridor
    (reference basic_cmu_2019.py:34)."""
    walker = CMUHumanoidPositionControlled()
    arena = WallsCorridor(
        wall_gap=4.0, wall_width=distributions.Uniform(1, 7),
        wall_height=3.0, corridor_width=10, corridor_length=100)
    task = RunThroughCorridor(
        walker=walker, arena=arena, walker_spawn_position=(0.5, 0, 1.3),
        target_velocity=3.0, physics_timestep=0.005,
        control_timestep=0.03)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def cmu_humanoid_run_gaps(random_state=None):
    """CMU humanoid running over gaps (reference basic_cmu_2019.py:70)."""
    walker = CMUHumanoidPositionControlled()
    arena = GapsCorridor(
        platform_length=distributions.Uniform(0.3, 2.5),
        gap_length=distributions.Uniform(0.5, 1.25),
        corridor_width=10, corridor_length=100)
    task = RunThroughCorridor(
        walker=walker, arena=arena, walker_spawn_position=(0.5, 0, 1.3),
        target_velocity=3.0, physics_timestep=0.005,
        control_timestep=0.03)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def cmu_humanoid_go_to_target(random_state=None):
    """CMU humanoid go-to-target (reference basic_cmu_2019.py:104)."""
    walker = CMUHumanoidPositionControlled()
    arena = Floor()
    task = GoToTarget(walker=walker, arena=arena,
                      physics_timestep=0.005, control_timestep=0.03)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)
