"""Multi-agent soccer task (reference: dm_control/locomotion/soccer/
task.py:36-267).

Per-player actions and observations share one physics batch: the action
vector is the concatenation of per-player controls (the reference returns
a list of specs; ``action_spec_per_player`` provides that view, and
``before_step`` accepts either a flat vector or a per-player list).
"""

from __future__ import annotations

import collections

import numpy as np
from dm_env import specs

from dm_control_tpu import composer
from dm_control_tpu.composer.batch import BatchableTask
from dm_control_tpu.locomotion.soccer import initializers as initializers_lib
from dm_control_tpu.locomotion.soccer import observables as observables_lib
from dm_control_tpu.locomotion.soccer.soccer_ball import SoccerBall
from dm_control_tpu.locomotion.soccer.team import Player, Team  # noqa: F401

_THROW_IN_BALL_Z = 0.5
_INIT_BALL_Z = 0.5
_SPAWN_RATIO = 0.6


def _disable_geom_contacts(entities):
    """Zeroes contype on every geom of the given entities (reference
    task.py:36-41)."""
    for entity in entities:
        root = entity.mjcf_model
        for geom in root.find_all("geom"):
            geom.attrib["contype"] = "0"


class Task(composer.Task, BatchableTask):
    """N-vs-N soccer with goal rewards (reference task.py:44-233).

    Also implements the BatchableTask protocol (composer/batch.py): pure
    mirrors of episode init / per-player egocentric observations / goal
    reward, so ``soccer.load_batch`` can step thousands of N-vs-N games
    per chip under one jit (BASELINE ladder rung 5; the reference's only
    parallelism for this task is one OS process per env).  The batched
    path currently supports the BoxHead walker (slide roots + steer yaw).
    """

    def __init__(self, players, arena, ball=None, initializer=None,
                 observables=None, disable_walker_contacts=False,
                 physics_timestep=0.005, control_timestep=0.025,
                 tracking_cameras=()):
        self.arena = arena
        self.players = list(players)
        self._initializer = (initializer
                             or initializers_lib.UniformInitializer())
        self._observables_adder = (
            observables or observables_lib.CoreObservablesAdder())
        if disable_walker_contacts:
            _disable_geom_contacts([p.walker for p in self.players])
        self.ball = ball or SoccerBall()
        arena.add_free_entity(self.ball)
        if hasattr(arena, "register_ball"):
            arena.register_ball(self.ball)
        self._scores = {Team.HOME: 0, Team.AWAY: 0}
        self._task_observables = collections.OrderedDict()
        self._player_index = {id(p): i for i, p in enumerate(self.players)}
        for player in self.players:
            arena.add_free_entity(player.walker)
            self.ball.register_player(player)
            self._observables_adder(self, player)
        self._tracking_cameras = tuple(tracking_cameras)
        # batch_reward returns one reward per player (reference task.py
        # get_reward returns a list); the batched runtime needs the
        # static shape to allocate/merge reward buffers.
        self.batch_reward_shape = (len(self.players),)
        self.set_timesteps(control_timestep, physics_timestep)

    # -- compat aliases -------------------------------------------------------

    @property
    def _arena(self):
        return self.arena

    @property
    def _players(self):
        return self.players

    @property
    def _ball(self):
        return self.ball

    def add_player_observable(self, player, name, observable):
        """Registers an observable under ``player_{i}/{name}`` (the
        reference attaches to the walker's observables; ours land in the
        task dict with the same leaf names)."""
        observable.enabled = True
        i = self._player_index[id(player)]
        self._task_observables[f"player_{i}/{name}"] = observable

    @property
    def root_entity(self):
        return self.arena

    # -- episode lifecycle ----------------------------------------------------

    def initialize_episode_mjcf(self, random_state):
        self.arena.initialize_episode_mjcf(random_state)

    def after_compile(self, physics, random_state):
        super().after_compile(physics, random_state)
        for camera in self._tracking_cameras:
            camera.after_compile(physics)

    def _tracked_entity_positions(self, physics):
        positions = [np.asarray(self.ball.get_pose(physics)[0])]
        for player in self.players:
            positions.append(np.asarray(
                player.walker.get_pose(physics)[0]))
        return positions

    def initialize_episode(self, physics, random_state):
        self.arena.initialize_episode(physics, random_state)
        self.ball.initialize_episode(physics, random_state)
        self._initializer(self, physics, random_state)
        if hasattr(self.arena, "update_detection"):
            self.arena.update_detection(physics)
        for camera in self._tracking_cameras:
            camera.initialize_episode(
                self._tracked_entity_positions(physics))

    # -- actions ------------------------------------------------------------

    def action_spec_per_player(self, physics):
        """List of per-player BoundedArrays (the reference's spec shape,
        soccer/task.py:210)."""
        full = physics.action_spec()
        nu_each = full.shape[0] // max(len(self.players), 1)
        out = []
        for i in range(len(self.players)):
            sl = slice(i * nu_each, (i + 1) * nu_each)
            out.append(specs.BoundedArray(
                shape=(nu_each,), dtype=full.dtype,
                minimum=full.minimum[sl], maximum=full.maximum[sl],
                name=f"player_{i}"))
        return out

    def _throw_in(self, physics, random_state, ball):
        """Pull an off-court ball back toward the field (reference
        task.py:118-126)."""
        x, y, _ = np.asarray(ball.position(physics))
        shrink_x, shrink_y = random_state.uniform([0.7, 0.7], [0.9, 0.9])
        ball.set_pose(physics, [x * shrink_x, y * shrink_y,
                                _THROW_IN_BALL_Z])
        ball.set_velocity(physics, velocity=np.zeros(3),
                          angular_velocity=np.zeros(3))
        ball.initialize_entity_trackers()

    def before_step(self, physics, action, random_state):
        if isinstance(action, (list, tuple)):
            action = np.concatenate([np.asarray(a).ravel() for a in action])
        physics.set_control(action)
        if (hasattr(self.arena, "detected_off_court")
                and self.arena.detected_off_court()):
            self._throw_in(physics, random_state, self.ball)

    # -- scoring ------------------------------------------------------------

    def _update_ball_contacts(self, physics):
        """Detects player-ball contacts and feeds the ball's
        hit/repossession/interception tracker (reference
        soccer_ball.py:50 contact registration)."""
        self.ball.clear_step_flags()
        m = physics.model
        d = physics.data
        ball_geoms = {gid for name, gid in m.names.geom.items()
                      if name.startswith(self.ball.name)}
        if not ball_geoms:
            return
        dist = np.asarray(d.contact.dist)
        g1 = np.asarray(d.contact.geom1)
        g2 = np.asarray(d.contact.geom2)
        active = np.where(dist < 0)[0]
        if not len(active):
            return
        geom_owner = {}
        for player in self.players:
            prefix = player.walker.name
            for name, gid in m.names.geom.items():
                if name.startswith(prefix):
                    geom_owner[gid] = player
        last = self.ball.last_hit
        ball_pos = self.ball.position(physics)
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
                self.ball.update_hit(player, teammate, position=ball_pos)

    def after_step(self, physics, random_state):
        self._update_ball_contacts(physics)
        if hasattr(self.arena, "update_detection"):
            self.arena.update_detection(physics)
        scored = self.arena.detected_goal()
        if scored is not None:
            self._scores[scored] += 1
        for camera in self._tracking_cameras:
            camera.after_step(self._tracked_entity_positions(physics))

    @property
    def scores(self):
        return dict(self._scores)

    def get_reward(self, physics):
        """+1 for the scoring team's players, -1 for the other
        (returned as a per-player list like the reference,
        task.py:138-165)."""
        del physics
        scoring_team = self.arena.detected_goal()
        if scoring_team is None:
            return [np.zeros((), np.float32) for _ in self.players]
        return [np.ones((), np.float32) if p.team == scoring_team
                else -np.ones((), np.float32) for p in self.players]

    def get_reward_spec(self):
        return [specs.Array(name="reward", shape=(), dtype=np.float32)
                for _ in self.players]

    def get_discount(self, physics):
        del physics
        if self.arena.detected_goal() is not None:
            return np.zeros((), np.float32)
        return np.ones((), np.float32)

    def get_discount_spec(self):
        return specs.Array(name="discount", shape=(), dtype=np.float32)

    def should_terminate_episode(self, physics):
        del physics
        return self.arena.detected_goal() is not None

    # -- batched path (composer.batch.BatchableTask) --------------------------
    # Pure mirrors of the hooks above over (Model, Data); per-player frames
    # come from the walker root-body rotation, goal detection from the same
    # axis-aligned goal regions the host Goal detectors use.

    def _batch_layout(self, m):
        """Resolves name-table addresses once per trace (host-side)."""
        names = m.names
        ball_jname = next(n for n in names.joint
                          if n.startswith(self.ball.name)
                          and n.endswith("_root"))
        bj = names.joint[ball_jname]
        players = []
        for p in self.players:
            w = p.walker.name
            players.append(dict(
                team=p.team,
                root_q=[int(m.jnt_qposadr[names.joint[f"{w}/root_{ax}"]])
                        for ax in "xyz"],
                root_d=[int(m.jnt_dofadr[names.joint[f"{w}/root_{ax}"]])
                        for ax in "xyz"],
                jnt_q=[int(m.jnt_qposadr[names.joint[f"{w}/{j}"]])
                       for j in p.walker.observable_joint_names],
                jnt_d=[int(m.jnt_dofadr[names.joint[f"{w}/{j}"]])
                       for j in p.walker.observable_joint_names],
                steer_q=int(m.jnt_qposadr[names.joint[f"{w}/steer"]]),
                root_bid=int(names.body[f"{w}/{p.walker.root_body_name}"]),
            ))
        return dict(
            ball_qadr=int(m.jnt_qposadr[bj]),
            ball_dadr=int(m.jnt_dofadr[bj]),
            ball_bid=int(m.jnt_bodyid[bj]),
            players=players,
        )

    def batch_init(self, m, qpos, qvel, rc, diff):
        import jax.numpy as jnp

        lay = self._batch_layout(m)
        spawn = np.asarray(self.arena.size, float) * _SPAWN_RATIO
        lo = jnp.asarray([-spawn[0], -spawn[1]])
        hi = jnp.asarray([spawn[0], spawn[1]])
        bxy = rc.uniform(lo, hi)
        a = lay["ball_qadr"]
        qpos = qpos.at[a].set(bxy[0]).at[a + 1].set(bxy[1])
        qpos = qpos.at[a + 2].set(_INIT_BALL_Z)
        for pl in lay["players"]:
            xy = rc.uniform(lo, hi)
            yaw = rc.uniform(-jnp.pi, jnp.pi)
            qpos = (qpos.at[pl["root_q"][0]].set(xy[0])
                        .at[pl["root_q"][1]].set(xy[1])
                        .at[pl["steer_q"]].set(yaw))
        return qpos, qvel, diff

    @staticmethod
    def _batch_goal_hits(lay, d):
        """(in_home_goal, in_away_goal) for the ball position."""
        import jax.numpy as jnp

        p = d.xpos[lay["ball_bid"]]

        def inside(goal):
            lo = jnp.asarray(goal.lower, d.qpos.dtype)
            hi = jnp.asarray(goal.upper, d.qpos.dtype)
            return jnp.all((p >= lo) & (p <= hi))
        return inside, p

    def batch_observation(self, m, d):
        import collections

        import jax.numpy as jnp

        lay = self._batch_layout(m)
        ball_d = lay["ball_dadr"]
        ball_pos = d.xpos[lay["ball_bid"]]
        ball_linv = d.qvel[ball_d:ball_d + 3]
        ball_angv = d.qvel[ball_d + 3:ball_d + 6]
        home_mid = jnp.asarray(self.arena._home_goal.mid, d.qpos.dtype)
        away_mid = jnp.asarray(self.arena._away_goal.mid, d.qpos.dtype)

        obs = collections.OrderedDict()
        for i, pl in enumerate(lay["players"]):
            R = d.xmat[pl["root_bid"]]  # body->world

            def ego(vec, R=R):
                return R.T @ vec

            pos = d.xpos[pl["root_bid"]]
            vel = jnp.stack([d.qvel[a] for a in pl["root_d"]])
            pre = f"player_{i}"
            obs[f"{pre}/joints_pos"] = jnp.stack(
                [d.qpos[a] for a in pl["jnt_q"]])
            obs[f"{pre}/joints_vel"] = jnp.stack(
                [d.qvel[a] for a in pl["jnt_d"]])
            obs[f"{pre}/ball_ego_position"] = ego(ball_pos - pos)
            obs[f"{pre}/ball_ego_linear_velocity"] = ego(ball_linv - vel)
            obs[f"{pre}/ball_ego_angular_velocity"] = ego(ball_angv)
            # Reference naming (observables.py clockwise_names):
            # team_goal_* is the player's OWN goal, opponent_goal_* the
            # other team's, field_front_left/back_right are field
            # corners; AWAY players see the rotated-by-half view.
            is_home = pl["team"] == Team.HOME
            own_mid = home_mid if is_home else away_mid
            opp_mid = away_mid if is_home else home_mid
            field_lo = jnp.asarray(self.arena.field.lower, d.qpos.dtype)
            field_hi = jnp.asarray(self.arena.field.upper, d.qpos.dtype)
            front = field_hi if is_home else field_lo
            back = field_lo if is_home else field_hi

            def ego_xy(corner_xy, pos=pos, R=R):
                v = jnp.concatenate([corner_xy - pos[:2],
                                     jnp.zeros((1,), corner_xy.dtype)])
                return (R.T @ v)[:2]

            obs[f"{pre}/team_goal_mid"] = ego(own_mid - pos)
            obs[f"{pre}/opponent_goal_mid"] = ego(opp_mid - pos)
            obs[f"{pre}/field_front_left"] = ego_xy(front)
            obs[f"{pre}/field_back_right"] = ego_xy(back)
            others_pos, others_vel, mask = [], [], []
            for j, other in enumerate(lay["players"]):
                if j == i:
                    continue
                opos = d.xpos[other["root_bid"]]
                ovel = jnp.stack([d.qvel[a] for a in other["root_d"]])
                others_pos.append(ego(opos - pos))
                others_vel.append(ego(ovel - vel))
                mask.append(1.0 if other["team"] == pl["team"] else 0.0)
            if others_pos:
                obs[f"{pre}/others_ego_position"] = jnp.concatenate(
                    others_pos)
                obs[f"{pre}/others_ego_linear_velocity"] = jnp.concatenate(
                    others_vel)
                obs[f"{pre}/teammate_mask"] = jnp.asarray(
                    mask, d.qpos.dtype)
            to_ball = ball_pos[:2] - pos[:2]
            dist = jnp.linalg.norm(to_ball)
            obs[f"{pre}/stats_vel_to_ball"] = jnp.where(
                dist > 1e-6, jnp.dot(to_ball / jnp.maximum(dist, 1e-6),
                                     vel[:2]), 0.0)
        return obs

    def batch_reward(self, m, d):
        import jax.numpy as jnp

        lay = self._batch_layout(m)
        inside, _ = self._batch_goal_hits(lay, d)
        in_home = inside(self.arena._home_goal)  # away scored
        in_away = inside(self.arena._away_goal)  # home scored
        team_sign = jnp.asarray(
            [1.0 if pl["team"] == Team.HOME else -1.0
             for pl in lay["players"]], d.qpos.dtype)
        score = (jnp.asarray(in_away, d.qpos.dtype)
                 - jnp.asarray(in_home, d.qpos.dtype))
        return score * team_sign

    def batch_termination(self, m, d):
        import jax.numpy as jnp

        lay = self._batch_layout(m)
        inside, _ = self._batch_goal_hits(lay, d)
        scored = inside(self.arena._home_goal) | inside(
            self.arena._away_goal)
        return scored, jnp.where(scored,
                                 jnp.asarray(0.0, d.qpos.dtype),
                                 jnp.asarray(1.0, d.qpos.dtype))


class MultiturnTask(Task):
    """Continuous game play through scoring events until timeout
    (reference task.py:236-267)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._should_reset = False

    def should_terminate_episode(self, physics):
        del physics
        return False

    def get_discount(self, physics):
        del physics
        return np.ones((), np.float32)

    def before_step(self, physics, action, random_state):
        super().before_step(physics, action, random_state)
        if self._should_reset:
            self.ball.initialize_entity_trackers()
            self._should_reset = False

    def after_step(self, physics, random_state):
        super().after_step(physics, random_state)
        if self.arena.detected_goal() is not None:
            self._initializer(self, physics, random_state)
            # Goal detection stays stale so this step's reward fires;
            # refresh only the off-court state for the next before_step.
            if hasattr(self.arena, "field"):
                self.arena.field.update(physics)
            self._should_reset = True
