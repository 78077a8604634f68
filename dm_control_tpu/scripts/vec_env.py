"""Vectorized environment interfaces.

Reference: dm_control/scripts/vec_env.py — stable-baselines3-derived
`VecEnv` ABC (:196), `VecEnvWrapper` (:334), `CloudpickleWrapper` (:373),
`SubprocVecEnv` process-per-env with pipe command protocol and auto-reset
w/ `terminal_observation` (:396-532).

These host-process classes exist for API compatibility and for wrapping
host-bound (Python-loop) environments.  The TPU-native replacement is
``JaxVecEnv`` below / ``dm_control_tpu.rl.batch_env.BatchEnv``: the env
batch is one pytree stepped by a single jit-compiled vmapped function —
no processes, no pipes, no per-env Python.
"""

from __future__ import annotations

import abc
import multiprocessing as mp
import pickle

import numpy as np


def flatten_obs_dict(obs):
    """Concatenates observation dict values in sorted-key order."""
    return np.concatenate([
        np.atleast_1d(np.asarray(obs[k], np.float32)).ravel()
        for k in sorted(obs)])


class VecEnv(abc.ABC):
    """SB3-style API (reference vec_env.py:196-331)."""

    def __init__(self, num_envs, observation_space=None, action_space=None):
        self.num_envs = num_envs
        self.observation_space = observation_space
        self.action_space = action_space

    @abc.abstractmethod
    def reset(self):
        ...

    @abc.abstractmethod
    def step_async(self, actions):
        ...

    @abc.abstractmethod
    def step_wait(self):
        ...

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    @abc.abstractmethod
    def close(self):
        ...

    def get_attr(self, attr_name, indices=None):
        raise NotImplementedError

    def set_attr(self, attr_name, value, indices=None):
        raise NotImplementedError

    def env_method(self, method_name, *args, indices=None, **kwargs):
        raise NotImplementedError

    def seed(self, seed=None):
        raise NotImplementedError


class VecEnvWrapper(VecEnv):
    """reference vec_env.py:334-371."""

    def __init__(self, venv):
        self.venv = venv
        super().__init__(venv.num_envs, venv.observation_space,
                         venv.action_space)

    def reset(self):
        return self.venv.reset()

    def step_async(self, actions):
        self.venv.step_async(actions)

    def step_wait(self):
        return self.venv.step_wait()

    def close(self):
        self.venv.close()

    def get_attr(self, attr_name, indices=None):
        return self.venv.get_attr(attr_name, indices)

    def seed(self, seed=None):
        return self.venv.seed(seed)

    def __getattr__(self, name):
        return getattr(self.venv, name)


class CloudpickleWrapper:
    """Pickles a ctor by value (reference vec_env.py:373-393); uses
    cloudpickle when available, stdlib pickle otherwise."""

    def __init__(self, var):
        self.var = var

    def __getstate__(self):
        try:
            import cloudpickle

            return cloudpickle.dumps(self.var)
        except ImportError:
            return pickle.dumps(self.var)

    def __setstate__(self, var):
        self.var = pickle.loads(var)


class DummyVecEnv(VecEnv):
    """Sequential in-process vectorization over dm_env environments."""

    def __init__(self, env_fns):
        self.envs = [fn() for fn in env_fns]
        super().__init__(len(self.envs))
        self._actions = None

    def reset(self):
        return np.stack([flatten_obs_dict(e.reset().observation)
                         for e in self.envs])

    def step_async(self, actions):
        self._actions = actions

    def step_wait(self):
        obs, rews, dones, infos = [], [], [], []
        for env, a in zip(self.envs, self._actions):
            ts = env.step(a)
            o = flatten_obs_dict(ts.observation)
            done = ts.last()
            info = {}
            if done:
                # auto-reset (reference vec_env.py worker :44-56)
                info["terminal_observation"] = o
                o = flatten_obs_dict(env.reset().observation)
            obs.append(o)
            rews.append(ts.reward or 0.0)
            dones.append(done)
            infos.append(info)
        return (np.stack(obs), np.asarray(rews, np.float32),
                np.asarray(dones), infos)

    def close(self):
        pass

    def get_attr(self, attr_name, indices=None):
        idx = range(self.num_envs) if indices is None else indices
        return [getattr(self.envs[i], attr_name) for i in idx]

    def env_method(self, method_name, *args, indices=None, **kwargs):
        idx = range(self.num_envs) if indices is None else indices
        return [getattr(self.envs[i], method_name)(*args, **kwargs)
                for i in idx]

    def seed(self, seed=None):
        return [seed] * self.num_envs


def _worker(remote, parent_remote, env_fn_wrapper):
    """Pipe command protocol (reference vec_env.py:22-90)."""
    parent_remote.close()
    env = env_fn_wrapper.var()
    while True:
        try:
            cmd, data = remote.recv()
        except EOFError:
            break
        if cmd == "step":
            ts = env.step(data)
            o = flatten_obs_dict(ts.observation)
            done = ts.last()
            info = {}
            if done:
                info["terminal_observation"] = o
                o = flatten_obs_dict(env.reset().observation)
            remote.send((o, ts.reward or 0.0, done, info))
        elif cmd == "reset":
            remote.send(flatten_obs_dict(env.reset().observation))
        elif cmd == "close":
            remote.close()
            break
        elif cmd == "get_attr":
            remote.send(getattr(env, data))
        elif cmd == "env_method":
            name, args, kwargs = data
            remote.send(getattr(env, name)(*args, **kwargs))
        else:
            raise NotImplementedError(cmd)


class SubprocVecEnv(VecEnv):
    """Process-per-env (reference vec_env.py:396-532).  Provided for
    host-bound envs; prefer JaxVecEnv for anything jit-compatible."""

    def __init__(self, env_fns, start_method=None):
        self.waiting = False
        self.closed = False
        n_envs = len(env_fns)
        ctx = mp.get_context(start_method or "fork")
        self.remotes, self.work_remotes = zip(
            *[ctx.Pipe() for _ in range(n_envs)])
        self.processes = []
        for work_remote, remote, env_fn in zip(
                self.work_remotes, self.remotes, env_fns):
            p = ctx.Process(
                target=_worker,
                args=(work_remote, remote, CloudpickleWrapper(env_fn)),
                daemon=True)
            p.start()
            self.processes.append(p)
            work_remote.close()
        super().__init__(n_envs)

    def reset(self):
        for remote in self.remotes:
            remote.send(("reset", None))
        return np.stack([remote.recv() for remote in self.remotes])

    def step_async(self, actions):
        for remote, action in zip(self.remotes, actions):
            remote.send(("step", action))
        self.waiting = True

    def step_wait(self):
        results = [remote.recv() for remote in self.remotes]
        self.waiting = False
        obs, rews, dones, infos = zip(*results)
        return (np.stack(obs), np.asarray(rews, np.float32),
                np.asarray(dones), list(infos))

    def close(self):
        if self.closed:
            return
        if self.waiting:
            for remote in self.remotes:
                remote.recv()
        for remote in self.remotes:
            remote.send(("close", None))
        for p in self.processes:
            p.join()
        self.closed = True

    def get_attr(self, attr_name, indices=None):
        idx = range(self.num_envs) if indices is None else indices
        for i in idx:
            self.remotes[i].send(("get_attr", attr_name))
        return [self.remotes[i].recv() for i in idx]

    def env_method(self, method_name, *args, indices=None, **kwargs):
        idx = range(self.num_envs) if indices is None else indices
        for i in idx:
            self.remotes[i].send(
                ("env_method", (method_name, args, kwargs)))
        return [self.remotes[i].recv() for i in idx]

    def seed(self, seed=None):
        return [seed] * self.num_envs


class JaxVecEnv(VecEnv):
    """TPU-native vectorization: wraps ``rl.batch_env.BatchEnv`` behind
    the VecEnv API.  All envs step in one device dispatch; dict obs are
    flattened to a [B, D] array."""

    def __init__(self, model, task, num_envs, seed=0, **batch_kwargs):
        import jax

        from dm_control_tpu.rl.batch_env import BatchEnv

        self._env = BatchEnv(model, task, **batch_kwargs)
        self._rngs = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        self._state = None
        self._actions = None
        super().__init__(num_envs)

    @staticmethod
    def _flat(obs):
        parts = [np.asarray(obs[k], np.float32).reshape(
            next(iter(obs.values())).shape[0], -1) for k in sorted(obs)]
        return np.concatenate(parts, axis=1)

    def reset(self):
        self._state, ts = self._env.reset(self._rngs)
        return self._flat(ts.observation)

    def step_async(self, actions):
        self._actions = actions

    def step_wait(self):
        self._state, ts = self._env.step(self._state, self._actions)
        obs = self._flat(ts.observation)
        dones = np.asarray(ts.step_type) == 2
        return (obs, np.asarray(ts.reward, np.float32), dones,
                [{} for _ in range(self.num_envs)])

    def close(self):
        pass

    def seed(self, seed=None):
        import jax

        self._rngs = jax.random.split(
            jax.random.PRNGKey(seed or 0), self.num_envs)
        return [seed] * self.num_envs
