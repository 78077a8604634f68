"""Locomotion long tail: mazes, goal tasks, escape, rodent, rescale.

Reference scope: locomotion/arenas/mazes.py + covering.py,
tasks/random_goal_maze.py:36-478, tasks/escape.py:29, tasks/reach.py:38
(TwoTouch), walkers/rodent.py:60, walkers/rescale.py:21,
walkers/scaled_actuators.py:37.
"""

import numpy as np
import pytest

from dm_control_tpu.locomotion.arenas import covering
from dm_control_tpu.locomotion.arenas.mazes import MazeWithTargets, TextMaze

_LAYOUT = """*****
*P.G*
*.*.*
*G..*
*****"""


def test_covering_merges_walls():
    walls = covering.make_walls("***\n*.*\n***")
    cells = set()
    for w in walls:
        for y in range(w.start.y, w.end.y):
            for x in range(w.start.x, w.end.x):
                assert (y, x) not in cells, "overlapping walls"
                cells.add((y, x))
    assert cells == {(y, x) for y in range(3) for x in range(3)
                     if (y, x) != (1, 1)}
    assert len(walls) <= 4


def test_text_maze_fixed_and_random():
    maze = TextMaze(_LAYOUT)
    assert maze.height == 5 and maze.width == 5
    assert len(maze.find_tokens("G")) == 2
    assert len(maze.find_tokens("P")) == 1

    rnd = TextMaze(height=9, width=9, num_spawns=1, num_objects=3,
                   random_seed=1)
    assert len(rnd.find_tokens("G")) == 3
    layer1 = rnd.entity_layer
    rnd.regenerate(np.random.RandomState(2))
    assert rnd.entity_layer != layer1  # new layout
    # borders remain walls
    grid = rnd.entity_layer.splitlines()
    assert set(grid[0]) == {"*"} and set(grid[-1]) == {"*"}


def test_maze_arena_positions():
    arena = MazeWithTargets(TextMaze(_LAYOUT), xy_scale=2.0)
    assert len(arena.target_positions) == 2
    assert len(arena.spawn_positions) == 1
    # round trip grid <-> world
    g = arena.world_to_grid_positions(arena.target_positions)
    np.testing.assert_allclose(
        np.asarray(g).round(),
        np.asarray(arena.maze.find_tokens("G")), atol=1e-9)
    # walls exist as box geoms
    walls = [e for e in arena.mjcf_model.iter()
             if e.tag == "geom" and e.get("type") == "box"]
    assert walls


def _ball_maze_env(task_cls, **kwargs):
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.walkers.jumping_ball import (
        RollingBallWithHead,
    )

    walker = RollingBallWithHead()
    arena = MazeWithTargets(TextMaze(_LAYOUT), xy_scale=2.0)
    task = task_cls(walker=walker, maze_arena=arena,
                    contact_termination=False, **kwargs)
    return composer.Environment(task, time_limit=1.0, random_state=7)


def test_repeat_single_goal_maze_runs():
    from dm_control_tpu.locomotion.tasks import RepeatSingleGoalMaze

    env = _ball_maze_env(RepeatSingleGoalMaze)
    ts = env.reset()
    assert "target_position" in ts.observation
    for _ in range(3):
        ts = env.step(np.zeros(env.action_spec().shape))
        assert np.isfinite(ts.reward)


def test_many_goals_maze_rewards_on_activation():
    from dm_control_tpu.locomotion.props.target_sphere import TargetSphere
    from dm_control_tpu.locomotion.tasks import ManyGoalsMaze

    env = _ball_maze_env(
        ManyGoalsMaze,
        target_builder=lambda name: TargetSphere(radius=100.0, name=name),
        target_reward_scale=3.0)
    env.reset()
    # radius 100 targets: the walker is always inside -> all activate on
    # the first step, reward = n_targets * scale, then episode ends
    ts = env.step(np.zeros(env.action_spec().shape))
    assert ts.reward == pytest.approx(
        3.0 * len(env.task._targets))
    assert ts.last()


def test_escape_task_reward_increases_with_distance():
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.arenas import Bowl
    from dm_control_tpu.locomotion.tasks import Escape
    from dm_control_tpu.locomotion.walkers.jumping_ball import (
        RollingBallWithHead,
    )

    walker = RollingBallWithHead()
    arena = Bowl(size=(4, 4))
    task = Escape(walker=walker, arena=arena,
                  walker_spawn_position=(0, 0, 0.5))
    env = composer.Environment(task, time_limit=0.5, random_state=3)
    env.reset()
    r_center = task.get_reward(env.physics)
    walker.set_pose(env.physics, position=(6.0, 0, 0.5))
    env.physics.forward()
    r_far = task.get_reward(env.physics)
    assert r_far > r_center
    assert r_far > 0.9


def test_rodent_walks():
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.arenas import Floor
    from dm_control_tpu.locomotion.tasks import RunThroughCorridor
    from dm_control_tpu.locomotion.walkers.rodent import Rat

    walker = Rat()
    task = RunThroughCorridor(walker=walker, arena=Floor(),
                              walker_spawn_position=(0, 0, 0.1),
                              contact_termination=False,
                              physics_timestep=0.002,
                              control_timestep=0.02)
    env = composer.Environment(task, time_limit=0.2, random_state=1)
    ts = env.reset()
    for _ in range(4):
        ts = env.step(np.random.RandomState(0).uniform(
            -1, 1, env.action_spec().shape))
    assert np.isfinite(ts.reward)
    assert walker.aliveness(env.physics) > -0.2  # still upright-ish


def test_two_touch_state_machine():
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.arenas import Floor
    from dm_control_tpu.locomotion.tasks import TwoTouch
    from dm_control_tpu.locomotion.tasks.reach import TwoTouchState
    from dm_control_tpu.locomotion.walkers.jumping_ball import (
        RollingBallWithHead,
    )

    walker = RollingBallWithHead()
    task = TwoTouch(walker=walker, arena=Floor(size=(2, 2)),
                    target_area=(0.0, 0.0), z_height=0.3)
    env = composer.Environment(task, time_limit=3.0, random_state=5)
    ts = env.reset()
    assert "task_logic" in ts.observation
    assert int(ts.observation["task_logic"][0]) == TwoTouchState.PRE_TOUCH


def test_rescale_subtree():
    import dm_control_tpu.mjcf as mjcf
    from dm_control_tpu.locomotion.walkers.rescale import rescale_subtree

    root = mjcf.Element("mujoco")
    wb = root.add("worldbody")
    b = wb.add("body", name="b", pos="1 0 0")
    b.add("geom", name="g", type="capsule", fromto="0 0 0 0 0 1",
          size="0.1")
    rescale_subtree(wb, position_factor=2.0, size_factor=0.5)
    assert np.allclose(np.fromstring(b.get("pos"), sep=" "), [2, 0, 0])
    g = root.find("geom", "g")
    np.testing.assert_allclose(
        np.fromstring(g.get("fromto"), sep=" "), [0, 0, 0.75, 0, 0, 1.25])
    np.testing.assert_allclose(float(g.get("size")), 0.05)


def test_scaled_position_actuator_tracks_range():
    import dm_control_tpu.mjcf as mjcf
    from dm_control_tpu.locomotion.walkers.scaled_actuators import (
        add_position_actuator,
    )
    from dm_control_tpu.physics.physics import Physics

    root = mjcf.Element("mujoco")
    root.add("option", timestep="0.002")
    wb = root.add("worldbody")
    b = wb.add("body", name="arm", pos="0 0 0.5")
    j = b.add("joint", name="hinge", type="hinge", axis="0 1 0",
              damping="1", armature="0.1", limited="true",
              range="-90 90")
    b.add("geom", name="rod", type="capsule", fromto="0 0 0 0.3 0 0",
          size="0.02", mass="0.1")
    add_position_actuator(j, qposrange=(-1.0, 1.0), ctrlrange=(-1, 1),
                          kp=20.0)
    physics = Physics.from_mjcf_model(root)
    physics.forward()
    physics.set_control([0.5])  # should drive the hinge toward 0.5 rad
    for _ in range(1000):
        physics.step()
    assert abs(float(physics.data.qpos[0]) - 0.5) < 0.1
