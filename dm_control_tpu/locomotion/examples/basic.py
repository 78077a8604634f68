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


_MAZE_LAYOUT = """*********
*P....*.*
*.***.*.*
*.*G..*G*
*.*.***.*
*...*...*
*.*.*.*G*
*G*.....*
*********"""


def cmu_humanoid_maze_forage(random_state=None):
    """CMU humanoid foraging a maze for target spheres
    (reference basic_cmu_2019.py:127 maze_forage)."""
    from dm_control_tpu.locomotion.arenas import MazeWithTargets, TextMaze
    from dm_control_tpu.locomotion.props.target_sphere import TargetSphere
    from dm_control_tpu.locomotion.tasks import ManyGoalsMaze

    walker = CMUHumanoidPositionControlled()
    arena = MazeWithTargets(TextMaze(_MAZE_LAYOUT), xy_scale=3.0)
    task = ManyGoalsMaze(
        walker=walker, maze_arena=arena,
        target_builder=lambda name: TargetSphere(radius=0.4, name=name),
        target_reward_scale=1.0, physics_timestep=0.005,
        control_timestep=0.03)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def cmu_humanoid_heterogeneous_forage(random_state=None):
    """Two target types with different rewards
    (reference basic_cmu_2019.py:164)."""
    from dm_control_tpu.locomotion.arenas import MazeWithTargets, TextMaze
    from dm_control_tpu.locomotion.props.target_sphere import TargetSphere
    from dm_control_tpu.locomotion.tasks import ManyHeterogeneousGoalsMaze

    walker = CMUHumanoidPositionControlled()
    arena = MazeWithTargets(TextMaze(_MAZE_LAYOUT), xy_scale=3.0)
    task = ManyHeterogeneousGoalsMaze(
        walker=walker, maze_arena=arena,
        target_builders=[
            lambda name: TargetSphere(radius=0.4, name=name),
            lambda name: TargetSphere(radius=0.25, name=name),
        ],
        target_type_rewards=[1.0, 10.0],
        target_type_proportions=[2, 1],
        physics_timestep=0.005, control_timestep=0.03)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def rodent_escape_bowl(random_state=None):
    """Rodent escaping a bowl (reference basic_rodent_2020.py:37)."""
    from dm_control_tpu.locomotion.arenas import Bowl
    from dm_control_tpu.locomotion.tasks import Escape
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    walker = Rat()
    arena = Bowl(size=(20, 20))
    task = Escape(walker=walker, arena=arena,
                  walker_spawn_position=(0, 0, 0.2),
                  physics_timestep=0.001, control_timestep=0.02)
    return composer.Environment(task, time_limit=20,
                                random_state=random_state)


def rodent_run_gaps(random_state=None):
    """Rodent running over gaps (reference basic_rodent_2020.py:62)."""
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    walker = Rat()
    arena = GapsCorridor(
        platform_length=distributions.Uniform(0.4, 0.8),
        gap_length=distributions.Uniform(0.05, 0.2),
        corridor_width=2, corridor_length=40)
    task = RunThroughCorridor(
        walker=walker, arena=arena, walker_spawn_position=(0.5, 0, 0.2),
        target_velocity=1.0, physics_timestep=0.001,
        control_timestep=0.02)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def rodent_maze_forage(random_state=None):
    """Rodent maze foraging (reference basic_rodent_2020.py:97)."""
    from dm_control_tpu.locomotion.arenas import MazeWithTargets, TextMaze
    from dm_control_tpu.locomotion.props.target_sphere import TargetSphere
    from dm_control_tpu.locomotion.tasks import ManyGoalsMaze
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    walker = Rat()
    arena = MazeWithTargets(TextMaze(_MAZE_LAYOUT), xy_scale=0.5,
                            z_height=0.3)
    task = ManyGoalsMaze(
        walker=walker, maze_arena=arena,
        target_builder=lambda name: TargetSphere(radius=0.05, name=name),
        target_reward_scale=1.0, physics_timestep=0.001,
        control_timestep=0.02)
    return composer.Environment(task, time_limit=30,
                                random_state=random_state)


def rodent_two_touch(random_state=None):
    """Rodent two-tap task (reference basic_rodent_2020.py:140)."""
    from dm_control_tpu.locomotion.tasks import TwoTouch
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    walker = Rat()
    arena = Floor(size=(2, 2))
    task = TwoTouch(walker=walker, arena=arena,
                    target_type_rewards=(1.0,),
                    target_area=(0.5, 0.5), z_height=0.06,
                    physics_timestep=0.001, control_timestep=0.02)
    return composer.Environment(task, time_limit=15,
                                random_state=random_state)
