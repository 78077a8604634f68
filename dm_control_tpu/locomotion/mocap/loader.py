"""Trajectory loaders.

Reference: dm_control/locomotion/mocap/loader.py:30-105
(HDF5TrajectoryLoader decoding per-clip groups from an h5 file) and
cmu_mocap_data.py:34-50 (sha256-pinned dataset fetcher).

This environment has no network egress, so the CMU dataset cannot be
downloaded here; the loader reads an already-present h5 file (path from
``CMU_MOCAP_DIR`` or explicit), supporting both a flat array schema
(one group per clip with qpos/qvel/... datasets) and, for tests,
synthetic trajectories.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from dm_control_tpu.locomotion.mocap.trajectory import Trajectory


class TrajectoryLoader:
    """Base loader interface (reference loader.py:30)."""

    def get_trajectory(self, identifier, start_step=None, end_step=None):
        raise NotImplementedError

    def keys(self):
        raise NotImplementedError


class HDF5TrajectoryLoader(TrajectoryLoader):
    """Loads clips from an HDF5 file: each top-level group is a clip whose
    datasets are per-timestep feature arrays."""

    def __init__(self, path: str, trajectory_class=Trajectory):
        import h5py

        self._path = path
        self._trajectory_class = trajectory_class
        self._file = h5py.File(path, "r")

    def keys(self):
        return list(self._file.keys())

    def get_trajectory(self, identifier: str, start_step=None,
                       end_step=None) -> Trajectory:
        group = self._file[identifier]
        dt = float(group.attrs.get("dt", 0.03))
        if "walkers" in group:
            features = self._decode_reference_clip(group)
        else:
            # flat schema: datasets directly under the clip group
            features = {key: np.asarray(value)
                        for key, value in group.items()}
        traj = self._trajectory_class(features, dt=dt,
                                      identifier=identifier)
        if start_step is not None or end_step is not None:
            traj = traj.sub_trajectory(start_step or 0, end_step)
        return traj

    @staticmethod
    def _decode_reference_clip(group):
        """Decodes the reference's mocap h5 layout
        (dm_control/locomotion/mocap/loader.py + mocap_pb2: per-clip
        ``walkers/walker_0`` subgroups whose datasets are (feature_dim,
        T) arrays).  Produces time-major features incl. the assembled
        qpos = [position; quaternion; joints] and qvel = [velocity;
        angular_velocity; joints_velocity] this framework's tracking
        tasks consume, plus the raw per-body feature arrays."""
        w = group["walkers/walker_0"]

        def tm(key):  # (dim, T) -> (T, dim)
            return np.asarray(w[key]).T

        pos, quat, joints = tm("position"), tm("quaternion"), tm("joints")
        vel = tm("velocity")
        angvel = (tm("angular_velocity") if "angular_velocity" in w
                  else np.zeros_like(vel))
        jvel = tm("joints_velocity")
        T = pos.shape[0]
        features = {
            "qpos": np.concatenate([pos, quat, joints], axis=1),
            "qvel": np.concatenate([vel, angvel, jvel], axis=1),
            "position": pos, "quaternion": quat, "joints": joints,
            "joints_velocity": jvel, "velocity": vel,
            "angular_velocity": angvel,
        }
        for key, shape_last in (("center_of_mass", 3),
                                ("end_effectors", 3),
                                ("appendages", 3),
                                ("body_positions", 3),
                                ("body_quaternions", 4)):
            if key in w:
                arr = tm(key)  # (T, dim)
                features[key] = arr.reshape(T, -1, shape_last)
        return features


def cmu_mocap_path(version: str = "2019") -> str:
    """Path to the CMU mocap h5 (reference cmu_mocap_data.py:34-50).

    Looks in $CMU_MOCAP_DIR then ~/.dm_control; raises with download
    instructions when absent (this container has no egress)."""
    fname = {"2019": "cmu_2019_08756c01.h5",
             "2020": "cmu_2020_dfe3e9e0.h5"}.get(version)
    for base in (os.environ.get("CMU_MOCAP_DIR"),
                 os.path.expanduser("~/.dm_control")):
        if base and os.path.exists(os.path.join(base, fname)):
            return os.path.join(base, fname)
    raise FileNotFoundError(
        f"CMU mocap dataset {fname} not found. Download it with the "
        f"reference dm_control's cmu_mocap_data fetcher on a networked "
        f"machine and place it in $CMU_MOCAP_DIR or ~/.dm_control.")


def synthetic_walking_trajectory(nq: int, nv: int, num_steps: int = 120,
                                 dt: float = 0.03,
                                 identifier: str = "synthetic_walk",
                                 seed: int = 0) -> Trajectory:
    """A smooth synthetic clip for tests/benchmarks (sinusoidal joints on
    a forward-translating root)."""
    rng = np.random.RandomState(seed)
    t = np.arange(num_steps) * dt
    qpos = np.zeros((num_steps, nq))
    qvel = np.zeros((num_steps, nv))
    qpos[:, 0] = 0.6 * t  # root x advance
    qpos[:, 2] = 1.2
    qpos[:, 3] = 1.0  # identity quat
    phases = rng.uniform(0, 2 * np.pi, max(nq - 7, 0))
    amps = rng.uniform(0.05, 0.3, max(nq - 7, 0))
    for j in range(nq - 7):
        qpos[:, 7 + j] = amps[j] * np.sin(2 * np.pi * t + phases[j])
        qvel[:, 6 + j] = (amps[j] * 2 * np.pi
                          * np.cos(2 * np.pi * t + phases[j]))
    qvel[:, 0] = 0.6
    return Trajectory({"qpos": qpos, "qvel": qvel}, dt=dt,
                      identifier=identifier)


# ---------------------------------------------------------------------------
# Protobuf trajectory serialization (the analogue of the reference's
# mocap.proto + mocap_pb2, reference loader.py:83-105 proto decoding).
# ---------------------------------------------------------------------------


def trajectory_to_proto(traj: Trajectory):
    """Encodes a Trajectory as a mocap_pb2.Trajectory message."""
    from dm_control_tpu.locomotion.mocap.proto import mocap_pb2

    msg = mocap_pb2.Trajectory(identifier=str(traj.identifier),
                               dt=float(traj.dt))
    qpos = np.asarray(traj["qpos"])
    qvel = (np.asarray(traj["qvel"]) if "qvel" in traj.keys()
            else np.zeros((len(qpos), 0)))
    for t in range(len(qpos)):
        ts = msg.timesteps.add()
        ts.qpos.extend(qpos[t].tolist())
        if qvel.shape[1]:
            ts.qvel.extend(qvel[t].tolist())
    return msg


def trajectory_from_proto(msg) -> Trajectory:
    qpos = np.array([list(ts.qpos) for ts in msg.timesteps])
    features = {"qpos": qpos}
    if msg.timesteps and len(msg.timesteps[0].qvel):
        features["qvel"] = np.array([list(ts.qvel)
                                     for ts in msg.timesteps])
    return Trajectory(features, dt=float(msg.dt),
                      identifier=str(msg.identifier))


def save_trajectory_bank(path: str, trajectories) -> None:
    """Serializes {id: Trajectory} to a TrajectoryBank proto file."""
    from dm_control_tpu.locomotion.mocap.proto import mocap_pb2

    bank = mocap_pb2.TrajectoryBank()
    for traj in (trajectories.values()
                 if isinstance(trajectories, dict) else trajectories):
        bank.trajectories.append(trajectory_to_proto(traj))
    with open(path, "wb") as f:
        f.write(bank.SerializeToString())


class ProtoTrajectoryLoader(TrajectoryLoader):
    """Loads clips from a TrajectoryBank proto file (the reference's
    proto-backed loader path)."""

    def __init__(self, path: str, trajectory_class=Trajectory):
        from dm_control_tpu.locomotion.mocap.proto import mocap_pb2

        with open(path, "rb") as f:
            bank = mocap_pb2.TrajectoryBank.FromString(f.read())
        self._trajectory_class = trajectory_class
        self._trajectories = {
            str(msg.identifier): trajectory_from_proto(msg)
            for msg in bank.trajectories}

    def keys(self):
        return list(self._trajectories)

    def get_trajectory(self, identifier: str, start_step=None,
                       end_step=None) -> Trajectory:
        traj = self._trajectories[identifier]
        if start_step is not None or end_step is not None:
            traj = traj.sub_trajectory(start_step or 0, end_step)
        return traj
