"""Preconfigured multi-clip mocap tracking environment
(reference: dm_control/locomotion/examples/cmu_2020_tracking.py:12-40)."""

from __future__ import annotations

from dm_control_tpu import composer
from dm_control_tpu.locomotion.arenas import Floor
from dm_control_tpu.locomotion.mocap import loader as loader_lib
from dm_control_tpu.locomotion.tasks.reference_pose import (
    datasets, tracking,
)
from dm_control_tpu.locomotion.walkers.cmu_humanoid import (
    CMUHumanoidPositionControlledV2020,
)


def _walk_trajectories(walker):
    """Clip source: the real CMU 2020 h5 when present, otherwise a small
    synthetic walking bank (this container has no egress)."""
    try:
        path = loader_lib.cmu_mocap_path(version="2020")
        ldr = loader_lib.HDF5TrajectoryLoader(path)
        collection = datasets.get_dataset("walk_tiny", loader=ldr)
        return {i: ldr.get_trajectory(i) for i in collection.ids}
    except FileNotFoundError:
        njoint = len(walker.mocap_joint_names)
        return {f"synthetic_walk_{k}": loader_lib.
                synthetic_walking_trajectory(
                    nq=njoint + 7, nv=njoint + 6, seed=k,
                    identifier=f"synthetic_walk_{k}")
                for k in range(3)}


def cmu_humanoid_tracking(random_state=None):
    """A CMU humanoid tracking the walk_tiny clip set (reference
    cmu_2020_tracking.py:12)."""
    walker = CMUHumanoidPositionControlledV2020()
    arena = Floor()
    task = tracking.MultiClipMocapTracking(
        walker=walker,
        arena=arena,
        ref_path_or_trajectories=_walk_trajectories(walker),
        ref_steps=(1, 2, 3, 4, 5),
        min_steps=10,
        reward_type="comic",
    )
    return composer.Environment(task, time_limit=30,
                                random_state=random_state,
                                strip_singleton_obs_buffer_dim=True)
