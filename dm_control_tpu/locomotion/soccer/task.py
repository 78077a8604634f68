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

    def _root_linvel(self, physics, entity):
        """World-frame linear velocity of a free entity's root joint."""
        prefix = entity.name
        for jname, j in physics.model.names.joint.items():
            if jname.startswith(prefix) and jname.endswith("_root"):
                a = int(physics.model.jnt_dofadr[j])
                return np.asarray(physics.data.qvel[a:a + 3])
        return np.zeros(3)

    def _add_player_observables(self, i, player):
        """Per-player egocentric observable suite (reference
        soccer/observables.py CoreObservablesAdder): ball position /
        velocity / angular velocity, both goals, every other player's
        position and velocity, and game statistics."""
        ball = self._ball
        walker = player.walker
        others = [p for p in self._players if p is not player]
        obs = {}

        def ego(physics, vec):
            return walker.transform_vec_to_egocentric_frame(physics, vec)

        def ball_ego(physics):
            return ego(physics,
                       ball.position(physics) - walker.root_xpos(physics))

        def ball_ego_vel(physics):
            return ego(physics, self._root_linvel(physics, ball)
                       - self._root_linvel(physics, walker))

        def goal_ego(physics, team):
            goal = (self._arena.home_goal if team == "home"
                    else self._arena.away_goal)
            mid = (np.asarray(goal.lower) + np.asarray(goal.upper)) / 2
            return ego(physics, mid - walker.root_xpos(physics))

        def others_ego(physics):
            root = walker.root_xpos(physics)
            out = [ego(physics, o.walker.root_xpos(physics) - root)
                   for o in others]
            return np.hstack(out) if out else np.zeros(0)

        def others_ego_vel(physics):
            mine = self._root_linvel(physics, walker)
            out = [ego(physics,
                       self._root_linvel(physics, o.walker) - mine)
                   for o in others]
            return np.hstack(out) if out else np.zeros(0)

        def teammate_mask(physics):
            del physics
            return np.array([1.0 if o.team == player.team else 0.0
                             for o in others])

        def stats_vel_to_ball(physics):
            """Own speed toward the ball (reference observables
            stats_vel_to_ball)."""
            to_ball = ball.position(physics) - walker.root_xpos(physics)
            n = np.linalg.norm(to_ball[:2])
            if n < 1e-9:
                return np.zeros(1)
            v = self._root_linvel(physics, walker)
            return np.array([float(v[:2] @ (to_ball[:2] / n))])

        def stats_ball_events(physics):
            """[i_am_last_hit, hit, repossessed, intercepted]
            (reference soccer_ball hit/interception tracking)."""
            del physics
            return np.array([
                1.0 if ball.last_hit is player else 0.0,
                1.0 if ball.hit else 0.0,
                1.0 if ball.repossessed else 0.0,
                1.0 if ball.intercepted else 0.0,
            ])

        obs["ball_ego_position"] = Generic(lambda p: ball_ego(p))
        obs["ball_ego_linear_velocity"] = Generic(
            lambda p: ball_ego_vel(p))
        obs["team_goal_back_right"] = Generic(
            lambda p: goal_ego(p, player.team))
        obs["field_front_left"] = Generic(
            lambda p: goal_ego(p, "away" if player.team == "home"
                               else "home"))
        obs["others_ego_position"] = Generic(lambda p: others_ego(p))
        obs["others_ego_linear_velocity"] = Generic(
            lambda p: others_ego_vel(p))
        obs["teammate_mask"] = Generic(teammate_mask)
        obs["stats_vel_to_ball"] = Generic(stats_vel_to_ball)
        obs["stats_ball_events"] = Generic(stats_ball_events)
        name = f"player_{i}"
        for k, o in obs.items():
            o.enabled = True
            self._task_observables[f"{name}/{k}"] = o

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

    def _update_ball_contacts(self, physics):
        """Detects player-ball contacts and feeds the ball's
        hit/repossession/interception tracker (reference
        soccer_ball.py:50 contact registration)."""
        self._ball.clear_step_flags()
        m = physics.model
        d = physics.data
        ball_geoms = {gid for name, gid in m.names.geom.items()
                      if name.startswith(self._ball.name)}
        if not ball_geoms:
            return
        dist = np.asarray(d.contact.dist)
        g1 = np.asarray(d.contact.geom1)
        g2 = np.asarray(d.contact.geom2)
        active = np.where(dist < 0)[0]
        if not len(active):
            return
        geom_owner = {}
        for player in self._players:
            prefix = player.walker.name
            for name, gid in m.names.geom.items():
                if name.startswith(prefix):
                    geom_owner[gid] = player
        last = self._ball.last_hit
        for k in active:
            a, b = int(g1[k]), int(g2[k])
            player = None
            if a in ball_geoms:
                player = geom_owner.get(b)
            elif b in ball_geoms:
                player = geom_owner.get(a)
            if player is not None:
                teammate = (last is not None
                            and last.team == player.team)
                self._ball.update_hit(player, teammate)

    def after_step(self, physics, random_state):
        self._update_ball_contacts(physics)
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
