"""Multi-agent soccer task (reference: dm_control/locomotion/soccer/
task.py:36-221 + observables.py).

Per-player actions and observations share one physics batch: the action
vector is the concatenation of per-player controls (the reference returns
a list of specs; ``action_spec_per_player`` provides that view).
"""

from __future__ import annotations

import collections

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu.composer.observation.observable import Generic


class Player:
    def __init__(self, team, walker):
        self.team = team
        self.walker = walker


class Task(composer.Task):
    """N-vs-N soccer with goal rewards."""

    def __init__(self, players, arena, ball, contact_termination=False,
                 physics_timestep=0.005, control_timestep=0.025):
        self._arena = arena
        self._players = list(players)
        self._ball = ball
        arena.add_free_entity(ball)
        for player in self._players:
            arena.add_free_entity(player.walker)
            player.walker.observables.enable_proprioception()
        self._scores = {"home": 0, "away": 0}
        self._terminated = False
        self._task_observables = collections.OrderedDict()
        for i, player in enumerate(self._players):
            self._add_player_observables(i, player)
        self.set_timesteps(control_timestep, physics_timestep)

    def _add_player_observables(self, i, player):
        ball = self._ball
        walker = player.walker
        others = [p for p in self._players if p is not player]

        def ball_ego(physics, walker=walker):
            bp = ball.position(physics)
            return walker.transform_vec_to_egocentric_frame(
                physics, bp - walker.root_xpos(physics))

        def others_ego(physics, walker=walker, others=tuple(others)):
            root = walker.root_xpos(physics)
            out = [walker.transform_vec_to_egocentric_frame(
                physics, o.walker.root_xpos(physics) - root)
                for o in others]
            return np.hstack(out) if out else np.zeros(0)

        name = f"player_{i}"
        self._task_observables[f"{name}/ball_ego_position"] = Generic(
            ball_ego)
        self._task_observables[f"{name}/others_ego_position"] = Generic(
            others_ego)
        for obs in self._task_observables.values():
            obs.enabled = True

    @property
    def root_entity(self):
        return self._arena

    @property
    def players(self):
        return self._players

    def initialize_episode(self, physics, random_state):
        self._terminated = False
        self._ball.initialize_episode(physics, random_state)
        size = self._arena.size
        self._ball.set_pose(physics, position=[0, 0, self._ball.radius])
        for i, player in enumerate(self._players):
            sign = 1 if player.team == "home" else -1
            x = sign * random_state.uniform(0.25, 0.75) * size[0]
            y = random_state.uniform(-0.5, 0.5) * size[1]
            angle = random_state.uniform(-np.pi, np.pi)
            player.walker.set_pose(
                physics, position=[x, y, 1.0],
                quaternion=[np.cos(angle / 2), 0, 0, np.sin(angle / 2)])

    # -- actions ------------------------------------------------------------

    def action_spec_per_player(self, physics):
        """List of per-player BoundedArrays (the reference's spec shape,
        soccer/task.py:36)."""
        full = physics.action_spec()
        nu_each = full.shape[0] // max(len(self._players), 1)
        out = []
        for i in range(len(self._players)):
            sl = slice(i * nu_each, (i + 1) * nu_each)
            out.append(specs.BoundedArray(
                shape=(nu_each,), dtype=full.dtype,
                minimum=full.minimum[sl], maximum=full.maximum[sl],
                name=f"player_{i}"))
        return out

    def before_step(self, physics, action, random_state):
        if isinstance(action, (list, tuple)):
            action = np.concatenate([np.asarray(a).ravel() for a in action])
        physics.set_control(action)

    # -- scoring ------------------------------------------------------------

    def after_step(self, physics, random_state):
        ball_pos = self._ball.position(physics)
        goal = self._arena.detected_goal(ball_pos)
        if goal is not None:
            scoring_team = "away" if goal.team == "home" else "home"
            self._scores[scoring_team] += 1
            self._terminated = True

    def get_reward(self, physics):
        """+1 for the scoring team's players, -1 for the other
        (returned as a per-player list like the reference)."""
        ball_pos = self._ball.position(physics)
        goal = self._arena.detected_goal(ball_pos)
        if goal is None:
            return [0.0] * len(self._players)
        scoring_team = "away" if goal.team == "home" else "home"
        return [1.0 if p.team == scoring_team else -1.0
                for p in self._players]

    def should_terminate_episode(self, physics):
        return self._terminated

    def get_discount(self, physics):
        return 0.0 if self._terminated else 1.0


class MultiturnTask(Task):
    """Continues play after goals instead of terminating
    (reference task.py:221)."""

    def after_step(self, physics, random_state):
        ball_pos = self._ball.position(physics)
        goal = self._arena.detected_goal(ball_pos)
        if goal is not None:
            scoring_team = "away" if goal.team == "home" else "home"
            self._scores[scoring_team] += 1
            # reset the ball to center, play on
            self._ball.set_pose(
                physics, position=[0, 0, self._ball.radius])
