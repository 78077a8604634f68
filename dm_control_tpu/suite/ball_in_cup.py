"""Ball-in-cup domain (reference: dm_control/suite/ball_in_cup.py)."""

from __future__ import annotations

import collections

import jax.numpy as jnp

from dm_control_tpu.rl import control
from dm_control_tpu.suite import base
from dm_control_tpu.suite.models.ball_in_cup import MODEL
from dm_control_tpu.suite._domain import compile_domain_model
from dm_control_tpu.utils import containers

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
SUITE = containers.TaggedTasks()


def get_model():
    return compile_domain_model(MODEL)


@SUITE.add("benchmarking", "easy")
def catch(time_limit=_DEFAULT_TIME_LIMIT, random=None,
          environment_kwargs=None):
    m = get_model()
    return control.Environment(
        m, BallInCup(), time_limit=time_limit,
        control_timestep=_CONTROL_TIMESTEP, random=random,
        **(environment_kwargs or {}))


class BallInCup(base.Task):
    """Catch the ball in the cup (reference ball_in_cup.py BallInCup).

    Initial ball position rejection-sampled until penetration-free."""

    max_reset_rejections = 100

    def init(self, m, qpos, qvel, rc, diff):
        qpos = self.set_joint_qpos(m, qpos, "ball_x",
                                   rc.uniform(-0.2, 0.2))
        qpos = self.set_joint_qpos(m, qpos, "ball_z",
                                   rc.uniform(0.2, 0.5))
        return qpos, qvel, diff

    def reject(self, m, d):
        # penetration check: any active contact (physics.data.ncon > 0)
        from dm_control_tpu.physics import engine

        d = engine.fwd_position(m, d)
        return jnp.any(d.contact.dist < 0)

    def observation(self, m, d):
        obs = collections.OrderedDict()
        obs["position"] = d.qpos
        obs["velocity"] = d.qvel
        return obs

    def reward(self, m, d):
        target = d.site_xpos[m.names.site["target"]][jnp.array([0, 2])]
        ball = d.xpos[m.names.body["ball"]][jnp.array([0, 2])]
        ball_to_target = jnp.abs(target - ball)
        target_size = m.site_size[m.names.site["target"], jnp.array([0, 2])]
        ball_size = m.geom_size[m.names.geom["ball"], 0]
        in_target = jnp.all(ball_to_target < (target_size - ball_size))
        return in_target.astype(d.qpos.dtype)
