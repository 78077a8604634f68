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
from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.locomotion.mocap.trajectory import Trajectory
from dm_control_tpu.locomotion.mocap.types import ClipCollection
from dm_control_tpu.locomotion.tasks.reference_pose import rewards as rw

DEFAULT_PHYSICS_TIMESTEP = 0.005


class ReferencePosesTask(composer.Task):
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


class MultiClipMocapTracking(ReferencePosesTask):
    """Multi-clip tracking with per-clip sampling weights
    (reference tracking.py:899)."""

    def __init__(self, walker, arena, ref_path_or_trajectories,
                 dataset=None, reward_type="comic", **kwargs):
        super().__init__(walker, arena, ref_path_or_trajectories,
                         dataset=dataset, reward_type=reward_type, **kwargs)
