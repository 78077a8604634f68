"""Mocap tracking task.

Reference: dm_control/locomotion/tasks/reference_pose/tracking.py:114-899 —
``ReferencePosesTask`` loads a clip collection, selects a clip + start per
episode, tracks termination error against the reference pose, and exposes
the reference-relative observation family; ``MultiClipMocapTracking`` adds
the multi-clip curriculum.

TPU-first design: walker features, the termination error, the reward
(rewards.py zoo), and every ``reference_rel_*`` observation are computed
by ONE set of jnp functions over (Model, Data) — the host composer hooks
and the ``batch_*`` mirrors both call them, so host/batch parity holds by
construction.  Reference features are precomputed once per clip bank by
running the framework's own FK over the clip qpos (the reference ships
them inside its h5 files; tracking.py:579, utils.py:128-170).
"""

from __future__ import annotations

import collections
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu import composer
from dm_control_tpu.composer.batch import BatchableTask
from dm_control_tpu.composer.observation.observable import Generic
from dm_control_tpu.locomotion.mocap.trajectory import Trajectory
from dm_control_tpu.locomotion.mocap.types import ClipCollection
from dm_control_tpu.locomotion.tasks.reference_pose import rewards as rw
from dm_control_tpu.physics import kinematics as kin
from dm_control_tpu.physics.model import JointType, make_data

DEFAULT_PHYSICS_TIMESTEP = 0.005

#: observation keys of the reference-relative family
#: (reference tracking.py:786-820 get_all_reference_observations)
REFERENCE_OBSERVATION_KEYS = (
    "walker/reference_rel_joints",
    "walker/reference_rel_bodies_pos_global",
    "walker/reference_rel_bodies_quats",
    "walker/reference_rel_bodies_pos_local",
    "walker/reference_ego_bodies_quats",
    "walker/reference_rel_root_quat",
    "walker/reference_rel_root_pos_local",
    "walker/reference_appendages_pos",
)


def _quat_conj(q):
    return jnp.stack([q[..., 0], -q[..., 1], -q[..., 2], -q[..., 3]],
                     axis=-1)


def _quat_mul(a, b):
    w1, x1, y1, z1 = (a[..., 0], a[..., 1], a[..., 2], a[..., 3])
    w2, x2, y2, z2 = (b[..., 0], b[..., 1], b[..., 2], b[..., 3])
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def _quat_diff(source, target):
    """Passive rotation from source to target: conj(source) * target
    (reference transformations.quat_diff)."""
    return _quat_mul(_quat_conj(jnp.asarray(source)), jnp.asarray(target))


def _quat_to_mat3(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class ReferencePosesTask(composer.Task, BatchableTask):
    """Track reference qpos/qvel trajectories."""

    def __init__(self, walker, arena,
                 ref_path_or_trajectories,
                 dataset: Optional[ClipCollection] = None,
                 ref_steps: Sequence[int] = (1, 2, 3, 4, 5),
                 termination_error_threshold: float = 0.3,
                 body_error_multiplier: float = 1.0,
                 min_steps: int = 10,
                 reward_type: str = "termination_reward",
                 physics_timestep: float = DEFAULT_PHYSICS_TIMESTEP,
                 always_init_at_clip_start: bool = False,
                 enabled_reference_observables: Optional[
                     Sequence[str]] = None):
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
        self._body_error_multiplier = body_error_multiplier
        self._min_steps = min_steps
        self._reward_fn = rw.get_reward(reward_type)
        self._always_init_at_clip_start = always_init_at_clip_start

        self._clip: Optional[Trajectory] = None
        self._clip_index = 0
        self._time_step = 0
        self._start_step = 0
        self._end_mocap = False
        self._termination_error = 0.0
        self._should_truncate = False
        self._bank = None
        self._lay = None
        self.last_reward_terms = None

        enabled = (tuple(enabled_reference_observables)
                   if enabled_reference_observables is not None
                   else REFERENCE_OBSERVATION_KEYS)
        self._task_observables = collections.OrderedDict()
        for key in REFERENCE_OBSERVATION_KEYS:
            def obs_fn(physics, _key=key):
                return np.asarray(self._host_reference_obs(physics)[_key],
                                  float)
            self._task_observables[key] = Generic(obs_fn)
            self._task_observables[key].enabled = key in enabled
        # control advances one mocap frame per step, so the control
        # timestep IS the clip dt (reference tracking.py uses the
        # loaded clip's dt; 0.03 is the CMU-2019 default)
        dts = {float(t.dt) for t in self._trajectories.values()}
        if len(dts) > 1:
            raise ValueError(f"clips disagree on dt: {sorted(dts)}")
        control_timestep = dts.pop() if dts else 0.03
        self.set_timesteps(control_timestep, physics_timestep)

    @property
    def root_entity(self):
        return self._arena

    # -- name-table layout (host-side, resolved once) ------------------------

    def _layout(self, m):
        """Walker addresses in the compiled model: root free joint, mocap
        joints, tracked bodies, end effectors (reference
        utils.get_features, utils.py:128-170)."""
        if self._lay is not None:
            return self._lay
        prefix = self._walker.name + "/"
        names = m.names
        jnt_type = np.asarray(m.jnt_type)
        qadr = np.asarray(m.jnt_qposadr)
        dadr = np.asarray(m.jnt_dofadr)
        # the walker's root free joint: named either '<name>/...' (inside
        # the attached tree) or '<name>_root' (add_free_entity's joint on
        # the attachment frame itself)
        root_j = next(j for n, j in names.joint.items()
                      if n.startswith(self._walker.name)
                      and jnt_type[j] == JointType.FREE)
        joints = [names.joint[prefix + n]
                  for n in self._walker.observable_joint_names]
        # clip body_positions/body_quaternions columns align to the
        # walker's curated tracking-body sequence when it declares one
        # (reference walker.mocap_tracking_bodies); otherwise all
        # attached bodies in id order
        tracked = getattr(self._walker, "mocap_tracking_body_names", None)
        if tracked:
            body_ids = [names.body[prefix + n] for n in tracked]
        else:
            body_ids = sorted(b for n, b in names.body.items()
                              if n.startswith(prefix))
        ee_ids = [names.body[prefix + n]
                  for n in self._walker.end_effector_body_names]
        app_ids = list(ee_ids)
        for n, b in names.body.items():
            if n.startswith(prefix) and "head" in n and b not in app_ids:
                app_ids.append(b)
        self._lay = dict(
            root_qadr=int(qadr[root_j]), root_dadr=int(dadr[root_j]),
            root_bid=int(np.asarray(m.jnt_bodyid)[root_j]),
            jnt_qadr=np.asarray([qadr[j] for j in joints], np.int32),
            jnt_dadr=np.asarray([dadr[j] for j in joints], np.int32),
            body_ids=np.asarray(body_ids, np.int32),
            app_ids=np.asarray(app_ids, np.int32),
        )
        return self._lay

    # -- shared feature pipeline (host AND batch call these) -----------------

    def _features_from_data(self, m, d):
        """The reference walker feature dict (utils.py:128-170) computed
        from a live (Model, Data) — traceable, so the batched path uses
        the identical definition."""
        lay = self._layout(m)
        qpos, qvel = d.qpos, d.qvel
        a, v = lay["root_qadr"], lay["root_dadr"]
        root_pos = jax.lax.dynamic_slice_in_dim(qpos, a, 3)
        root_quat = jax.lax.dynamic_slice_in_dim(qpos, a + 3, 4)
        rmat = _quat_to_mat3(root_quat)
        app = (d.xpos[lay["app_ids"]] - root_pos) @ rmat
        ee_count = len(self._walker.end_effector_body_names)
        return {
            "position": root_pos,
            "quaternion": root_quat,
            "joints": qpos[lay["jnt_qadr"]],
            "joints_velocity": qvel[lay["jnt_dadr"]],
            "center_of_mass": d.subtree_com[lay["root_bid"]],
            "end_effectors": app[:ee_count],
            "appendages": app,
            "body_positions": d.xpos[lay["body_ids"]],
            "body_quaternions": d.xquat[lay["body_ids"]],
            "velocity": jax.lax.dynamic_slice_in_dim(qvel, v, 3),
            "angular_velocity": jax.lax.dynamic_slice_in_dim(qvel, v + 3, 3),
        }

    def _reference_features_at(self, bank, clip, t, dtype):
        """Reference feature dict at (clip, timestep) from the bank —
        works with traced (clip, t) on the batched path."""
        t = jnp.clip(t, 0, bank["tmax"] - 1)

        def g(key):
            return jnp.asarray(bank[key], dtype)[clip, t]

        return {
            "position": g("root_pos"),
            "quaternion": g("root_quat"),
            "joints": g("joints"),
            "joints_velocity": g("joints_vel"),
            "center_of_mass": g("com"),
            "end_effectors": g("appendages")[
                :len(self._walker.end_effector_body_names)],
            "appendages": g("appendages"),
            "body_positions": g("body_pos"),
            "body_quaternions": g("body_quat"),
            "velocity": g("root_vel"),
            "angular_velocity": g("root_angvel"),
        }

    def _termination_error_from(self, wf, rf):
        """0.5 * body_error_multiplier * mean|body pos diff| +
        0.5 * mean|joints diff| (reference tracking.py:579-591)."""
        err_joints = jnp.mean(jnp.abs(rf["joints"] - wf["joints"]))
        err_bodies = jnp.mean(
            jnp.abs(rf["body_positions"] - wf["body_positions"]))
        return (0.5 * self._body_error_multiplier * err_bodies
                + 0.5 * err_joints)

    def _reference_obs_from(self, m, d, wf, bank, clip, t):
        """The reference_rel_* observation family
        (reference tracking.py:652-788), one fused gather per key over
        all ref_steps."""
        dtype = d.qpos.dtype
        ks = jnp.asarray(self._ref_steps, jnp.int32)
        ts = jnp.clip(t + ks, 0, bank["tmax"] - 1)  # (K,)

        def g(key):
            return jnp.asarray(bank[key], dtype)[clip, ts]

        rmat = _quat_to_mat3(wf["quaternion"])  # root rotation

        rel_joints = g("joints") - wf["joints"][None]
        rel_bodies = g("body_pos") - wf["body_positions"][None]  # (K,B,3)
        rel_bodies_local = rel_bodies @ rmat
        ref_bquat = g("body_quat")  # (K,B,4)
        rel_bquats = _quat_diff(wf["body_quaternions"][None], ref_bquat)
        ref_rquat = g("root_quat")  # (K,4)
        ego_bquats = _quat_diff(ref_rquat[:, None], ref_bquat)
        rel_rquat = _quat_diff(wf["quaternion"][None], ref_rquat)
        rel_root_local = (g("root_pos") - wf["position"][None]) @ rmat

        return collections.OrderedDict((
            ("walker/reference_rel_joints", rel_joints.reshape(-1)),
            ("walker/reference_rel_bodies_pos_global",
             rel_bodies.reshape(-1)),
            ("walker/reference_rel_bodies_quats", rel_bquats.reshape(-1)),
            ("walker/reference_rel_bodies_pos_local",
             rel_bodies_local.reshape(-1)),
            ("walker/reference_ego_bodies_quats", ego_bquats.reshape(-1)),
            ("walker/reference_rel_root_quat", rel_rquat.reshape(-1)),
            ("walker/reference_rel_root_pos_local",
             rel_root_local.reshape(-1)),
            ("walker/reference_appendages_pos",
             g("appendages").reshape(-1)),
        ))

    # -- clip bank (precomputed reference features) ---------------------------

    def _clip_bank(self, m):
        """Pads the clip collection into device-ready arrays and runs the
        framework's FK once per frame to produce the reference feature
        bank (the reference ships these precomputed in its h5;
        utils.py:128).  Cached as NUMPY host constants."""
        if self._bank is not None:
            return self._bank
        lay = self._layout(m)
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

        # FK every frame -> body/com/appendage reference features
        d0 = make_data(m)

        def fk(q):
            d = kin.com_pos(m, kin.kinematics(m, d0.replace(
                qpos=jnp.asarray(q, d0.qpos.dtype))))
            a = lay["root_qadr"]
            root_pos = jax.lax.dynamic_slice_in_dim(d.qpos, a, 3)
            root_quat = jax.lax.dynamic_slice_in_dim(d.qpos, a + 3, 4)
            app = ((d.xpos[lay["app_ids"]] - root_pos)
                   @ _quat_to_mat3(root_quat))
            return (d.xpos[lay["body_ids"]], d.xquat[lay["body_ids"]],
                    d.subtree_com[lay["root_bid"]], app)

        flat_q = qpos.reshape(-1, nq)
        # the bank may first be requested inside an outer jit trace (the
        # batched env's reset); the FK is a host-time constant, so force
        # concrete evaluation rather than inheriting the outer trace
        with jax.ensure_compile_time_eval():
            bp, bq, com, app = jax.jit(jax.vmap(fk))(flat_q)
        n_clip = len(ids)
        self._bank = {
            "qpos": qpos, "qvel": qvel,
            "ends": ends, "start_low": start_low,
            "max_start": max_start.astype(np.int32),
            "cum": cum, "tmax": tmax,
            "joints": qpos[:, :, lay["jnt_qadr"]],
            "joints_vel": qvel[:, :, lay["jnt_dadr"]],
            "root_pos": qpos[:, :, lay["root_qadr"]:lay["root_qadr"] + 3],
            "root_quat": qpos[:, :,
                              lay["root_qadr"] + 3:lay["root_qadr"] + 7],
            "root_vel": qvel[:, :, lay["root_dadr"]:lay["root_dadr"] + 3],
            "root_angvel": qvel[:, :,
                                lay["root_dadr"] + 3:lay["root_dadr"] + 6],
            "body_pos": np.asarray(bp).reshape(n_clip, tmax, -1, 3),
            "body_quat": np.asarray(bq).reshape(n_clip, tmax, -1, 4),
            "com": np.asarray(com).reshape(n_clip, tmax, 3),
            "appendages": np.asarray(app).reshape(n_clip, tmax, -1, 3),
        }
        # clips that SHIP precomputed reference features override the FK
        # reconstruction — the reference consumes the stored arrays
        # verbatim (tracking.py:1007, utils.get_features on the proto),
        # and real CMU banks bake them in
        stored = {"body_positions": "body_pos",
                  "body_quaternions": "body_quat",
                  "center_of_mass": "com",
                  "appendages": "appendages"}
        for k, cid in enumerate(ids):
            clip = self._trajectories[cid]
            keys = set(clip.keys())
            for src, dst in stored.items():
                if src not in keys:
                    continue
                arr = np.asarray(clip[src], np.float64)
                if src == "center_of_mass":
                    arr = arr.reshape(arr.shape[0], -1)[:, :3]
                n = min(arr.shape[0], tmax)
                dest = self._bank[dst]
                if not dest.flags.writeable:  # fresh-from-device array
                    dest = np.array(dest)
                    self._bank[dst] = dest
                if arr[:n].shape == dest[k, :n].shape:
                    dest[k, :n] = arr[:n]
                    dest[k, n:] = arr[n - 1]
        return self._bank

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
        self._clip_index = idx
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
        qpos = np.asarray(physics.data.qpos).copy()
        qvel = np.asarray(physics.data.qvel).copy()
        ref_qpos = np.asarray(frame["qpos"])
        ref_qvel = np.asarray(frame.get("qvel", np.zeros(len(qvel))))
        n = min(len(qpos), len(ref_qpos))
        qpos[:n] = ref_qpos[:n]
        nv = min(len(qvel), len(ref_qvel))
        qvel[:nv] = ref_qvel[:nv]
        physics._data = physics.data.replace(
            qpos=jnp.asarray(qpos, physics.data.qpos.dtype),
            qvel=jnp.asarray(qvel, physics.data.qvel.dtype))
        physics.mark_as_dirty()
        physics.forward()

    # -- host hooks (thin shims over the shared pipeline) ---------------------

    def _host_features(self, physics):
        if physics.is_dirty:
            physics.forward()
        return self._features_from_data(physics.model, physics.data)

    def _host_reference_features(self, physics, t=None):
        bank = self._clip_bank(physics.model)
        t = self._time_step if t is None else t
        return self._reference_features_at(
            bank, self._clip_index, jnp.asarray(t),
            physics.data.qpos.dtype)

    def _host_reference_obs(self, physics):
        bank = self._clip_bank(physics.model)
        wf = self._host_features(physics)
        return self._reference_obs_from(
            physics.model, physics.data, wf, bank,
            self._clip_index, jnp.asarray(self._time_step))

    def _update_error(self, physics):
        wf = self._host_features(physics)
        rf = self._host_reference_features(physics)
        self._termination_error = float(
            self._termination_error_from(wf, rf))
        if self._termination_error > self._termination_error_threshold:
            self._should_truncate = True

    # -- episode mechanics --------------------------------------------------

    def after_step(self, physics, random_state):
        self._time_step += 1
        self._update_error(physics)
        # the clip ends max(ref_steps)+1 frames early so the lookahead
        # reference observations never run off the end (reference
        # tracking.py:523 _last_step)
        if self._time_step >= self._clip_end - max(self._ref_steps) - 1:
            self._end_mocap = True

    def get_reward(self, physics):
        out = self._reward_fn(
            termination_error=self._termination_error,
            termination_error_threshold=self._termination_error_threshold,
            walker_features=self._host_features(physics),
            reference_features=self._host_reference_features(physics))
        self.last_reward_terms = out.reward_terms
        return float(out.reward)

    def should_terminate_episode(self, physics):
        return self._should_truncate or self._end_mocap

    def get_discount(self, physics):
        return 0.0 if self._should_truncate else 1.0

    # -- batched path (composer.batch.BatchableTask) -------------------------
    #
    # The clip bank becomes a padded device array bank; per-episode
    # clip/start selection is per-env data in the model_diff ("_clip",
    # "_start"), and the mocap cursor is derived from d.time — no host
    # state, so thousands of tracking envs step under one jit.  All task
    # logic calls the SAME feature/error/reward functions as the host.

    def batch_model_diff(self, m):
        return {"_clip": jnp.zeros((), jnp.int32),
                "_start": jnp.zeros((), jnp.int32)}

    def batch_init(self, m, qpos, qvel, rc, diff):
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
        st = m.task_state
        k = jnp.round(d.time / self.control_timestep).astype(jnp.int32)
        return st["_start"] + k

    def batch_observation(self, m, d):
        bank = self._clip_bank(m)
        wf = self._features_from_data(m, d)
        obs = collections.OrderedDict()
        obs["walker/joints_pos"] = wf["joints"]
        obs["walker/joints_vel"] = wf["joints_velocity"]
        obs["walker/root_quat"] = wf["quaternion"]
        obs["walker/root_velocity"] = jnp.concatenate(
            [wf["velocity"], wf["angular_velocity"]])
        obs.update(self._reference_obs_from(
            m, d, wf, bank, m.task_state["_clip"],
            self._batch_tstep(m, d)))
        return obs

    def batch_reward(self, m, d):
        bank = self._clip_bank(m)
        wf = self._features_from_data(m, d)
        rf = self._reference_features_at(
            bank, m.task_state["_clip"], self._batch_tstep(m, d),
            d.qpos.dtype)
        err = self._termination_error_from(wf, rf)
        out = self._reward_fn(
            termination_error=err,
            termination_error_threshold=self._termination_error_threshold,
            walker_features=wf, reference_features=rf)
        return jnp.asarray(out.reward, d.qpos.dtype)

    def batch_termination(self, m, d):
        bank = self._clip_bank(m)
        wf = self._features_from_data(m, d)
        rf = self._reference_features_at(
            bank, m.task_state["_clip"], self._batch_tstep(m, d),
            d.qpos.dtype)
        err = self._termination_error_from(wf, rf)
        truncate = err > self._termination_error_threshold
        # mirror the host path: clips end max(ref_steps)+1 frames early
        # (reference tracking.py:523 _last_step)
        end = self._batch_tstep(m, d) >= (
            jnp.asarray(bank["ends"])[m.task_state["_clip"]]
            - max(self._ref_steps) - 1)
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
