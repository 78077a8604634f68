"""Composer framework tests: entity attachment, observables, episode
mechanics (reference: composer/environment_test.py, updater_test.py)."""

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.arena import Floor
from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.composer.variation import distributions, noises
from dm_control_tpu.composer.variation.base import evaluate
from dm_control_tpu.mjcf.element import Element


class Ball(composer.Entity):
    def _build(self, name="ball"):
        self._mjcf_root = Element("mujoco", {"model": name})
        wb = self._mjcf_root.add("worldbody")
        body = wb.add("body", name="root")
        body.add("geom", name="sphere", type="sphere", size="0.1", mass="1")

    def _build_observables(self):
        obs = composer.Observables(self)
        obs.add_observable("position", Generic(
            lambda phys: phys.named_field(
                "xpos", self.attachment_frame.get("name"))))
        return obs


class DropTask(composer.Task):
    def __init__(self):
        self._arena = Floor()
        self._ball = Ball()
        self._arena.add_free_entity(self._ball)
        self._ball.observables.enable_all()
        self.set_timesteps(0.02, 0.002)
        self.hook_log = []

    @property
    def root_entity(self):
        return self._arena

    def initialize_episode(self, physics, random_state):
        self.hook_log.append("initialize_episode")
        self._ball.set_pose(physics, position=[0, 0, 1.0])

    def before_step(self, physics, action, random_state):
        self.hook_log.append("before_step")
        super().before_step(physics, action, random_state)

    def after_step(self, physics, random_state):
        self.hook_log.append("after_step")

    def get_reward(self, physics):
        pos, _ = self._ball.get_pose(physics)
        return float(pos[2])


def test_episode_mechanics():
    env = composer.Environment(DropTask(), time_limit=0.5, random_state=1)
    ts = env.reset()
    assert ts.first()
    assert "ball/position" in ts.observation
    rewards = []
    while not ts.last():
        ts = env.step(np.zeros(0))
        rewards.append(ts.reward)
    assert len(rewards) == 25  # 0.5s / 0.02s
    assert rewards[-1] < rewards[0]  # ball fell
    assert abs(rewards[-1] - 0.1) < 0.02  # resting on the floor
    task = env.task
    assert task.hook_log[0] == "initialize_episode"
    assert task.hook_log[1] == "before_step"


def test_attachment_prefixing():
    arena = Floor()
    ball = Ball()
    frame = arena.add_free_entity(ball)
    # single-root-body entities collapse into their root (no massless
    # wrapper body)
    assert frame.get("name") == "ball/root"
    names = [e.get("name") for e in arena.mjcf_model.iter()
             if e.get("name")]
    assert "ball/sphere" in names
    assert ball.parent is arena
    ball.detach()
    assert ball.parent is None


def test_observable_options():
    obs = Generic(lambda p: np.zeros(3), update_interval=2, buffer_size=4)
    assert obs.update_interval == 2
    obs.configure(delay=1, aggregator="mean")
    assert obs.delay == 1
    assert not obs.enabled
    obs.enabled = True
    assert obs.enabled


def test_variations():
    rng = np.random.RandomState(0)
    u = distributions.Uniform(0.0, 1.0)
    val = evaluate(u, random_state=rng)
    assert 0 <= val <= 1
    combo = 2 * u + 1
    val = evaluate(combo, random_state=rng)
    assert 1 <= val <= 3
    add = noises.Additive(distributions.Normal(scale=0.0))
    assert evaluate(add, initial_value=5.0, current_value=7.0,
                    random_state=rng) == 5.0
    sphere = distributions.UniformPointOnSphere()
    v = evaluate(sphere, random_state=rng)
    np.testing.assert_allclose(np.linalg.norm(v), 1.0)


def test_ik_initializer():
    import dm_control_tpu.suite as suite
    from dm_control_tpu.utils import inverse_kinematics as ik

    m = suite.acrobot.get_model()
    res = ik.qpos_from_site_pose(m, "tip",
                                 target_pos=np.array([0.5, 0.0, 1.5]))
    assert res.success
    assert res.err_norm < 1e-10
