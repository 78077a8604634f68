"""Training-stack tests (reference: dm_control/scripts/ + solver_test.py)."""


import numpy as np
import pytest

from dm_control_tpu.scripts.dataset import TrajectoryDataset
from dm_control_tpu.scripts.model import (ActorCritic, FFConfig, FFNet,
                                          GPT, GPTConfig)
from dm_control_tpu.scripts.ppo import PPOBuffer
from dm_control_tpu.scripts.trainer import (Trainer, TrainerConfig,
                                            lr_multiplier)


def _synthetic(seed=0, n_eps=5, obs_dim=4, act_dim=2):
    rng = np.random.RandomState(seed)
    W = rng.randn(obs_dim, act_dim) * 0.3
    obs, act, done = [], [], []
    for _ in range(n_eps):
        L = rng.randint(3, 30)
        o = rng.randn(L, obs_dim).astype(np.float32)
        a = np.tanh(o @ W).astype(np.float32)
        d = np.zeros(L, bool)
        d[-1] = True
        obs.append(o), act.append(a), done.append(d)
    return (np.concatenate(obs), np.concatenate(act), np.concatenate(done))


class TestTrajectoryDataset:

    def test_blocks_never_cross_episode_boundaries(self):
        import bisect

        obs, act, done = _synthetic()
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=6)
        for i in range(len(ds)):
            z = bisect.bisect_left(ds.logical_index, i)
            s = i + ds.logical_offset[z]
            # dones may only appear at the last step of the block
            assert not ds.dones[s:s + ds.block_size - 1].any()

    def test_short_episodes_removed(self):
        obs, act, done = _synthetic()
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=10)
        ep_lens = np.diff(np.concatenate(
            [[-1], np.nonzero(ds.dones)[0]]))
        assert (ep_lens >= 10).all()

    def test_getitem_shapes(self):
        obs, act, done = _synthetic()
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=6)
        o, a = ds[len(ds) - 1]
        assert o.shape == (6, 4) and a.shape == (6, 2)

    def test_batches_fixed_shape(self):
        obs, act, done = _synthetic()
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=4)
        for o, a in ds.batches(np.random.RandomState(0), 8):
            assert o.shape == (8, 4, 4) and a.shape == (8, 4, 2)


class TestModels:

    def test_gpt_bc_loss_decreases(self):
        obs, act, done = _synthetic(n_eps=6)
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=4)
        cfg = GPTConfig(obs_size=4, action_size=2, block_size=4,
                        n_layer=1, n_head=2, n_embd=16)
        tr = Trainer(GPT(cfg), ds, None,
                     TrainerConfig(max_epochs=5, batch_size=16,
                                   learning_rate=1e-3))
        hist = tr.train()
        assert hist[-1][0] < hist[0][0]

    def test_ffnet_mse_decreases(self):
        obs, act, done = _synthetic(n_eps=6)
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=1)
        tr = Trainer(FFNet(FFConfig(obs_size=4, action_size=2)), ds, None,
                     TrainerConfig(max_epochs=4, batch_size=32,
                                   learning_rate=1e-3))
        hist = tr.train()
        assert hist[-1][0] < hist[0][0]

    def test_checkpoint_roundtrip(self, tmp_path):
        import jax

        obs, act, done = _synthetic()
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=1)
        ck = str(tmp_path / "model.msgpack")
        tr = Trainer(FFNet(FFConfig(obs_size=4, action_size=2)), ds, None,
                     TrainerConfig(max_epochs=1, batch_size=32,
                                   ckpt_path=ck))
        tr.train()
        before = jax.tree_util.tree_leaves(tr.params)[0].copy()
        tr.load_checkpoint()
        after = jax.tree_util.tree_leaves(tr.params)[0]
        assert np.allclose(before, after)

    def test_config_json_roundtrip(self, tmp_path):
        cfg = GPTConfig(5, 3, 8, n_layer=2)
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        assert GPTConfig.from_json(p) == cfg

    def test_actor_critic_shapes(self):
        import jax
        import jax.numpy as jnp

        policy = ActorCritic(action_size=3)
        params = policy.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((7, 5)))["params"]
        (mu, std), a, v, logp = policy.apply(
            {"params": params}, jnp.zeros((7, 5)), deterministic=True)
        assert a.shape == (7, 3) and v.shape == (7,) and logp.shape == (7,)


def test_lr_schedule_warmup_then_cosine():
    cfg = TrainerConfig(warmup_tokens=100, final_tokens=1100,
                        lr_decay=True)
    assert lr_multiplier(50, cfg) == pytest.approx(0.5)
    assert lr_multiplier(100, cfg) == pytest.approx(1.0)
    assert lr_multiplier(600, cfg) == pytest.approx(0.5, abs=1e-6)
    assert lr_multiplier(1100, cfg) == pytest.approx(0.1)


def test_ppo_buffer_gae_matches_manual():
    buf = PPOBuffer(obs_dim=1, act_dim=1, n_envs=1, buffer_size=3,
                    gamma=0.9, lam=0.8)
    vals = [1.0, 2.0, 3.0]
    rews = [1.0, 0.0, 2.0]
    for t in range(3):
        buf.store(np.zeros((1, 1)), np.zeros((1, 1)), [rews[t]], [0.0],
                  [vals[t]], [0.0])
    buf.compute_returns_and_advantage(np.array([4.0]))
    d2 = rews[2] + 0.9 * 4.0 - vals[2]
    d1 = rews[1] + 0.9 * vals[2] - vals[1]
    d0 = rews[0] + 0.9 * vals[1] - vals[0]
    a2 = d2
    a1 = d1 + 0.9 * 0.8 * a2
    a0 = d0 + 0.9 * 0.8 * a1
    assert buf.advantages[:, 0] == pytest.approx([a0, a1, a2])
    assert buf.returns[:, 0] == pytest.approx(
        np.array([a0, a1, a2]) + vals)


def test_dummy_vec_env_autoreset():
    from dm_control_tpu import suite
    from dm_control_tpu.scripts.vec_env import DummyVecEnv

    def make():
        return suite.load("pendulum", "swingup",
                          task_kwargs={"random": 0, "time_limit": 0.1})

    venv = DummyVecEnv([make, make])
    obs = venv.reset()
    assert obs.shape[0] == 2
    done_seen = False
    for _ in range(8):
        obs, rews, dones, infos = venv.step(np.zeros((2, 1)))
        if dones.any():
            done_seen = True
            assert "terminal_observation" in infos[int(np.argmax(dones))]
    assert done_seen


def test_lqr_solver_stabilizes():
    from dm_control_tpu import suite
    from dm_control_tpu.suite import lqr_solver

    env = suite.load("lqr", "lqr_2_1", task_kwargs={"random": 0})
    env.reset()
    p, k, beta = lqr_solver.solve(env)
    assert beta < 1.0
    assert np.allclose(p, p.T, atol=1e-8)
    ts = env.reset()
    for _ in range(1200):
        x = np.hstack([np.asarray(env.physics.data.qpos),
                       np.asarray(env.physics.data.qvel)])
        ts = env.step(k @ x)
    assert float(ts.reward) > 0.95


def test_parse_amc_against_oracle(tmp_path):
    np.float = float  # the oracle's parse_amc uses the removed alias
    from dm_control import suite as ref_suite
    from dm_control.suite.utils import parse_amc as ref_amc

    from dm_control_tpu import suite
    from dm_control_tpu.suite.utils import parse_amc

    joints = [("root", 6), ("lowerback", 3), ("upperback", 3),
              ("thorax", 3), ("lowerneck", 3), ("upperneck", 3),
              ("head", 3), ("rclavicle", 2), ("rhumerus", 3),
              ("rradius", 1), ("rwrist", 1), ("rhand", 2),
              ("rfingers", 1), ("rthumb", 2), ("lclavicle", 2),
              ("lhumerus", 3), ("lradius", 1), ("lwrist", 1),
              ("lhand", 2), ("lfingers", 1), ("lthumb", 2),
              ("rfemur", 3), ("rtibia", 1), ("rfoot", 2), ("rtoes", 1),
              ("lfemur", 3), ("ltibia", 1), ("lfoot", 2), ("ltoes", 1)]
    rng = np.random.RandomState(0)
    lines = [":FULLY-SPECIFIED", ":DEGREES"]
    for t in range(1, 13):
        lines.append(str(t))
        for name, n in joints:
            vals = (rng.randn(n) * 5).round(4)
            if name == "root":
                vals[:3] = [t * 0.1, 17.0, t * 0.05]
            lines.append(name + " " + " ".join(map(str, vals)))
    fname = str(tmp_path / "clip.amc")
    with open(fname, "w") as f:
        f.write("\n".join(lines) + "\n")

    env = suite.load("humanoid_CMU", "stand", task_kwargs={"random": 0})
    dt = float(np.asarray(env.physics.model.opt.timestep))
    conv = parse_amc.convert(fname, env.physics, dt)

    ref_env = ref_suite.load("humanoid_CMU", "stand",
                             task_kwargs={"random": 0})
    ref_conv = ref_amc.convert(fname, ref_env.physics,
                               ref_env.physics.model.opt.timestep)
    assert np.abs(conv.qpos - ref_conv.qpos).max() < 1e-5
    assert np.allclose(conv.time, ref_conv.time)


@pytest.mark.slow
def test_cem_solver_beats_random():
    from dm_control_tpu import suite
    from dm_control_tpu.scripts.solver import CEMSolver

    env = suite.load("cartpole", "swingup", task_kwargs={"random": 0})
    env.reset()
    solver = CEMSolver(env.physics.model, env.task,
                       n_sub_steps=env._n_sub_steps, segment_length=25,
                       n_iterations=5, population=64)
    acts = solver.solve(env.physics.data, total_steps=50, seed=0)

    def replay(actions):
        e = suite.load("cartpole", "swingup", task_kwargs={"random": 0})
        e.reset()
        return sum(float(e.step(a).reward) for a in actions)

    rand = replay(np.random.RandomState(0).uniform(-1, 1, acts.shape))
    assert replay(acts) > rand + 0.5


class TestNativeLoader:

    def test_gather_matches_numpy(self):
        from dm_control_tpu.native import gather_blocks, load_library

        if load_library() is None:
            pytest.skip("no native toolchain")
        rng = np.random.RandomState(0)
        obs = rng.randn(1000, 8).astype(np.float32)
        act = rng.randn(1000, 2).astype(np.float32)
        starts = rng.randint(0, 990, 16).astype(np.int64)
        o, a = gather_blocks(obs, act, starts, block=6)
        g = starts[:, None] + np.arange(6)
        assert np.array_equal(o, obs[g]) and np.array_equal(a, act[g])

    def test_prefetch_loader_episode_safe_and_deterministic(self):
        from dm_control_tpu.native import PrefetchLoader, load_library

        if load_library() is None:
            pytest.skip("no native toolchain")
        obs, act, done = _synthetic(n_eps=8)
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=3)
        pl1 = PrefetchLoader(ds, batch_size=8, seed=3)
        pl2 = PrefetchLoader(ds, batch_size=8, seed=3)
        o1, a1 = pl1.next()
        o2, a2 = pl2.next()
        assert np.array_equal(o1, o2) and np.array_equal(a1, a2)
        # every block must be a verbatim episode-safe slice
        for b in range(8):
            idx = np.where(
                (ds.observations == o1[b, 0]).all(axis=1))[0]
            assert len(idx) >= 1
            s = int(idx[0])
            assert np.array_equal(o1[b], ds.observations[s:s + 3])
            assert not ds.dones[s:s + 2].any()
        pl1.close()
        pl2.close()

    def test_trainer_with_native_workers(self):
        from dm_control_tpu.native import load_library

        if load_library() is None:
            pytest.skip("no native toolchain")
        obs, act, done = _synthetic(n_eps=6)
        ds = TrajectoryDataset.from_arrays(obs, act, done, block_size=1)
        tr = Trainer(FFNet(FFConfig(obs_size=4, action_size=2)), ds, None,
                     TrainerConfig(max_epochs=3, batch_size=16,
                                   learning_rate=1e-3, num_workers=2))
        hist = tr.train()
        assert hist[-1][0] < hist[0][0]
