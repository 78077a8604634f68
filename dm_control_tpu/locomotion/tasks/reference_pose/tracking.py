"""Mocap tracking task.

Reference: dm_control/locomotion/tasks/reference_pose/tracking.py:114-899 —
``ReferencePosesTask`` loads a clip collection, selects a clip + start per
episode, tracks termination error against the reference pose, and exposes
reference-relative observations; ``MultiClipMocapTracking`` adds the
multi-clip curriculum.  Ghost-walker visualization is rendering-only and
omitted.
"""

from __future__ import annotations

import collections
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.batch import BatchableTask
from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.locomotion.mocap.trajectory import Trajectory
from dm_control_tpu.locomotion.mocap.types import ClipCollection
from dm_control_tpu.locomotion.tasks.reference_pose import rewards as rw

DEFAULT_PHYSICS_TIMESTEP = 0.005


class ReferencePosesTask(composer.Task, BatchableTask):
    """Track reference qpos/qvel trajectories."""

    def __init__(self, walker, arena,
                 ref_path_or_trajectories,
                 dataset: Optional[ClipCollection] = None,
                 ref_steps: Sequence[int] = (1, 2, 3, 4, 5),
                 termination_error_threshold: float = 0.3,
                 min_steps: int = 10,
                 reward_type: str = "termination_reward",
                 physics_timestep: float = DEFAULT_PHYSICS_TIMESTEP,
                 always_init_at_clip_start: bool = False):
        self._arena = arena
        self._walker = walker
        arena.add_free_entity(walker)
        walker.observables.enable_proprioception()

        if isinstance(ref_path_or_trajectories, dict):
            self._trajectories: Dict[str, Trajectory] = dict(
                ref_path_or_trajectories)
        else:
            from dm_control_tpu.locomotion.mocap.loader import (
                HDF5TrajectoryLoader,
            )

            loader = HDF5TrajectoryLoader(ref_path_or_trajectories)
            ids = dataset.ids if dataset else loader.keys()
            self._trajectories = {i: loader.get_trajectory(i) for i in ids}
        self._dataset = dataset or ClipCollection(
            ids=tuple(self._trajectories))
        self._ref_steps = tuple(ref_steps)
        self._termination_error_threshold = termination_error_threshold
        self._min_steps = min_steps
        self._reward_fn = rw.get_reward(reward_type)
        self._always_init_at_clip_start = always_init_at_clip_start

        self._clip: Optional[Trajectory] = None
        self._time_step = 0
        self._start_step = 0
        self._end_mocap = False
        self._termination_error = 0.0
        self._should_truncate = False

        def ref_obs(physics):
            return self._reference_observations(physics)

        self._task_observables = collections.OrderedDict(
            reference_rel_joints=Generic(ref_obs))
        self._task_observables["reference_rel_joints"].enabled = True
        control_timestep = 0.03  # mocap dt
        self.set_timesteps(control_timestep, physics_timestep)

    @property
    def root_entity(self):
        return self._arena

    # -- episode selection (reference tracking.py:451-527) ------------------

    def _select_clip(self, random_state):
        weights = np.asarray(self._dataset.weights, float)
        probs = weights / weights.sum()
        idx = random_state.choice(len(self._dataset.ids), p=probs)
        clip_id = self._dataset.ids[idx]
        clip = self._trajectories[clip_id]
        start_low = self._dataset.start_steps[idx]
        end = (self._dataset.end_steps[idx] if self._dataset.end_steps
               else clip.num_steps)
        max_start = max(start_low,
                        end - self._min_steps - max(self._ref_steps))
        if self._always_init_at_clip_start or max_start <= start_low:
            start = start_low
        else:
            start = random_state.randint(start_low, max_start)
        self._clip = clip
        self._start_step = start
        self._time_step = start
        self._clip_end = end

    def initialize_episode(self, physics, random_state):
        self._select_clip(random_state)
        frame = self._clip.get_timestep_data(self._time_step)
        self._set_walker_from_frame(physics, frame)
        self._should_truncate = False
        self._end_mocap = False
        self._update_error(physics)

    def _set_walker_from_frame(self, physics, frame):
        import jax.numpy as jnp

        m = physics.model
        qpos = np.asarray(physics.data.qpos).copy()
        qvel = np.asarray(physics.data.qvel).copy()
        ref_qpos = np.asarray(frame["qpos"])
        ref_qvel = np.asarray(frame.get("qvel", np.zeros(len(qvel))))
        n = min(len(qpos), len(ref_qpos))
        qpos[:n] = ref_qpos[:n]
        nv = min(len(qvel), len(ref_qvel))
        qvel[:nv] = ref_qvel[:nv]
        physics._data = physics.data.replace(qpos=jnp.asarray(qpos),
                                             qvel=jnp.asarray(qvel))

    # -- features / error (reference tracking.py:579-788) -------------------

    def _walker_features(self, physics):
        qpos = np.asarray(physics.data.qpos)
        qvel = np.asarray(physics.data.qvel)
        root_pos = self._walker.root_xpos(physics)
        root_mat = self._walker.root_xmat(physics)
        appendages = []
        for name in self._walker.end_effector_body_names:
            p = np.asarray(physics.named_field(
                "xpos", self._walker._prefixed(name)))
            appendages.append((p - root_pos) @ root_mat)
        return {
            "joints": qpos[7:],
            "joints_velocity": qvel[6:],
            "center_of_mass": root_pos,
            "appendages": (np.hstack(appendages) if appendages
                           else np.zeros(0)),
            "body_quaternions": qpos[3:7],
        }

    def _reference_features(self, step):
        step = min(step, self._clip.num_steps - 1)
        frame = self._clip.get_timestep_data(step)
        qpos = np.asarray(frame["qpos"])
        qvel = np.asarray(frame.get("qvel", np.zeros(0)))
        return {
            "joints": qpos[7:],
            "joints_velocity": qvel[6:] if qvel.size else np.zeros(0),
            "center_of_mass": qpos[:3],
            "appendages": np.zeros(0),
            "body_quaternions": qpos[3:7],
        }

    def _update_error(self, physics):
        """Termination error: mean |joint diff| + root position error
        (reference tracking.py:579 — pose-based tracking error)."""
        wf = self._walker_features(physics)
        rf = self._reference_features(self._time_step)
        n = min(len(wf["joints"]), len(rf["joints"]))
        joint_err = (np.mean(np.abs(wf["joints"][:n] - rf["joints"][:n]))
                     if n else 0.0)
        com_err = np.linalg.norm(wf["center_of_mass"]
                                 - rf["center_of_mass"])
        self._termination_error = 0.5 * joint_err + 0.5 * com_err
        if self._termination_error > self._termination_error_threshold:
            self._should_truncate = True

    def _reference_observations(self, physics):
        """Reference-relative future poses
        (reference tracking.py:652-788)."""
        wf = self._walker_features(physics)
        out = []
        for k in self._ref_steps:
            rf = self._reference_features(self._time_step + k)
            n = min(len(wf["joints"]), len(rf["joints"]))
            out.append(rf["joints"][:n] - wf["joints"][:n])
        return np.hstack(out) if out else np.zeros(0)

    # -- episode mechanics --------------------------------------------------

    def after_step(self, physics, random_state):
        self._time_step += 1
        self._update_error(physics)
        if self._time_step >= self._clip_end - 1:
            self._end_mocap = True

    def get_reward(self, physics):
        out = self._reward_fn(
            termination_error=self._termination_error,
            termination_error_threshold=self._termination_error_threshold,
            walker_features=self._walker_features(physics),
            reference_features=self._reference_features(self._time_step))
        self.last_reward_terms = out.reward_terms
        return float(out.reward)

    def should_terminate_episode(self, physics):
        return self._should_truncate or self._end_mocap

    def get_discount(self, physics):
        return 0.0 if self._should_truncate else 1.0

    # -- batched path (composer.batch.BatchableTask) -------------------------
    #
    # The clip collection becomes a padded device array bank; per-episode
    # clip/start selection is per-env data in the model_diff ("_clip",
    # "_start"), and the mocap cursor is derived from d.time — no host
    # state, so thousands of tracking envs step under one jit.

    def _clip_bank(self, m):
        # cached as NUMPY (host constants): jnp arrays created inside a
        # trace are tracers and must not be cached across traces
        if getattr(self, "_bank", None) is not None:
            return self._bank
        nq, nv = int(m.nq), int(m.nv)
        ids = list(self._dataset.ids)
        tmax = max(self._trajectories[i].num_steps for i in ids)
        qpos = np.zeros((len(ids), tmax, nq))
        qvel = np.zeros((len(ids), tmax, nv))
        ends = np.zeros(len(ids), np.int32)
        start_low = np.asarray(self._dataset.start_steps
                               or [0] * len(ids), np.int32)
        for k, cid in enumerate(ids):
            clip = self._trajectories[cid]
            for tt in range(clip.num_steps):
                fr = clip.get_timestep_data(tt)
                q = np.asarray(fr["qpos"])
                v = np.asarray(fr.get("qvel", np.zeros(0)))
                nq_c = min(nq, len(q))
                qpos[k, tt, :nq_c] = q[:nq_c]
                if v.size:
                    nv_c = min(nv, len(v))
                    qvel[k, tt, :nv_c] = v[:nv_c]
            qpos[k, clip.num_steps:] = qpos[k, clip.num_steps - 1]
            ends[k] = (self._dataset.end_steps[k]
                       if self._dataset.end_steps else clip.num_steps)
        max_start = np.maximum(
            start_low, ends - self._min_steps - max(self._ref_steps))
        weights = np.asarray(self._dataset.weights
                             or [1.0] * len(ids), float)
        cum = np.cumsum(weights / weights.sum())
        self._bank = {
            "qpos": qpos, "qvel": qvel,
            "ends": ends, "start_low": start_low,
            "max_start": max_start.astype(np.int32),
            "cum": cum, "tmax": tmax,
        }
        return self._bank

    def batch_model_diff(self, m):
        import jax.numpy as jnp

        return {"_clip": jnp.zeros((), jnp.int32),
                "_start": jnp.zeros((), jnp.int32)}

    def batch_init(self, m, qpos, qvel, rc, diff):
        import jax.numpy as jnp

        bank = self._clip_bank(m)
        idx = jnp.clip(jnp.searchsorted(jnp.asarray(bank["cum"]),
                                        rc.uniform()),
                       0, len(bank["cum"]) - 1).astype(jnp.int32)
        lo = jnp.asarray(bank["start_low"])[idx]
        hi = jnp.asarray(bank["max_start"])[idx]
        span = jnp.maximum(hi - lo, 0)
        u = rc.uniform()
        start = lo + jnp.floor(u * span).astype(jnp.int32)
        if self._always_init_at_clip_start:
            start = lo
        qpos = jnp.asarray(bank["qpos"], qpos.dtype)[idx, start]
        qvel = jnp.asarray(bank["qvel"], qvel.dtype)[idx, start]
        return qpos, qvel, dict(diff, _clip=idx, _start=start)

    def _batch_tstep(self, m, d):
        import jax.numpy as jnp

        st = m.task_state
        k = jnp.round(d.time / self.control_timestep).astype(jnp.int32)
        return st["_start"] + k

    def _batch_error(self, m, d):
        import jax.numpy as jnp

        bank = self._clip_bank(m)
        ts = jnp.clip(self._batch_tstep(m, d), 0, bank["tmax"] - 1)
        ref_q = jnp.asarray(bank["qpos"],
                            d.qpos.dtype)[m.task_state["_clip"], ts]
        joint_err = jnp.mean(jnp.abs(d.qpos[7:] - ref_q[7:]))
        com_err = jnp.linalg.norm(d.qpos[:3] - ref_q[:3])
        return 0.5 * joint_err + 0.5 * com_err

    def batch_observation(self, m, d):
        import jax.numpy as jnp

        bank = self._clip_bank(m)
        obs = collections.OrderedDict()
        obs["walker/joints_pos"] = d.qpos[7:]
        obs["walker/joints_vel"] = d.qvel[6:]
        obs["walker/root_quat"] = d.qpos[3:7]
        obs["walker/root_velocity"] = d.qvel[:6]
        ts = self._batch_tstep(m, d)
        qbank = jnp.asarray(bank["qpos"], d.qpos.dtype)
        rels = []
        for k in self._ref_steps:
            tk = jnp.clip(ts + k, 0, bank["tmax"] - 1)
            ref_q = qbank[m.task_state["_clip"], tk]
            rels.append(ref_q[7:] - d.qpos[7:])
        obs["reference_rel_joints"] = jnp.concatenate(rels)
        return obs

    def batch_reward(self, m, d):
        import jax.numpy as jnp

        err = self._batch_error(m, d)
        return jnp.asarray(1.0 - err / self._termination_error_threshold,
                           d.qpos.dtype)

    def batch_termination(self, m, d):
        import jax.numpy as jnp

        bank = self._clip_bank(m)
        err = self._batch_error(m, d)
        truncate = err > self._termination_error_threshold
        end = self._batch_tstep(m, d) >= jnp.asarray(bank["ends"])[
            m.task_state["_clip"]] - 1
        discount = jnp.where(truncate, jnp.zeros((), d.qpos.dtype),
                             jnp.ones((), d.qpos.dtype))
        return truncate | end, discount


class MultiClipMocapTracking(ReferencePosesTask):
    """Multi-clip tracking with per-clip sampling weights
    (reference tracking.py:899)."""

    def __init__(self, walker, arena, ref_path_or_trajectories,
                 dataset=None, reward_type="comic", **kwargs):
        super().__init__(walker, arena, ref_path_or_trajectories,
                         dataset=dataset, reward_type=reward_type, **kwargs)
