"""Duplo stud-coupling prop tests
(reference: dm_control/entities/props/duplo/duplo_test.py)."""

import numpy as np
import pytest

from dm_control_tpu.entities.props.duplo import (
    _STUD_SIZE_PARAMS, BRICK_HEIGHT, Duplo,
)
from dm_control_tpu.entities.props.duplo import utils
from dm_control_tpu.physics.physics import Physics

# empirical separation-force distribution of real Duplo bricks
# (reference duplo_test.py:37-44)
EXPECTED_MIN_FORCE = 6.0
EXPECTED_MAX_FORCE = 18.0


def _stacked_physics(**kwargs):
    top, bottom = Duplo(**kwargs), Duplo(**kwargs)
    arena, frame = utils.stack_bricks(top, bottom)
    return Physics.from_mjcf_model(arena.mjcf_model), frame


def test_model_structure():
    brick = Duplo()
    assert brick.studs.shape == (2, 4)
    assert brick.holes.shape == (2, 4)
    for r in range(2):
        for c in range(4):
            assert brick.studs[r, c].get("name") == f"stud_{r}{c}"
    radius = brick.stud_radius
    brick.set_stud_radius(0.0049)
    assert brick.stud_radius == pytest.approx(0.0049)
    assert radius != pytest.approx(0.0049)


def test_stud_radius_sampling_bounds():
    """Per-episode radius randomization reaches the COMPILED model even
    after attach (Entity.attach deep-copies the element tree, so tree
    writes alone would be a silent no-op — advisor finding, round 4)."""
    sizes = _STUD_SIZE_PARAMS[(False, True)]
    top, bottom = Duplo(variation=1.0), Duplo(variation=1.0)
    arena, _frame = utils.stack_bricks(top, bottom)
    physics = Physics.from_mjcf_model(arena.mjcf_model)
    ids = top._stud_geom_ids(physics.model)
    default = float(np.asarray(physics.model.geom_size)[ids[0], 0])
    seen = set()
    for seed in range(5):
        top.initialize_episode(physics, np.random.RandomState(seed))
        size = np.asarray(physics.model.geom_size)
        rbound = np.asarray(physics.model.geom_rbound)
        radii = size[ids, 0]
        assert np.all(radii >= sizes.minimum - 1e-12)
        assert np.all(radii <= sizes.maximum + 1e-12)
        # all 8 studs share the draw; rbound stays consistent
        assert len(set(radii.tolist())) == 1
        np.testing.assert_allclose(
            rbound[ids], np.sqrt(radii ** 2 + size[ids, 1] ** 2))
        seen.add(float(radii[0]))
    assert len(seen) > 1  # the draw actually varies
    assert any(abs(r - default) > 1e-9 for r in seen)

    # variation=0: deterministic lower-quartile radius
    fixed_top, fixed_bottom = Duplo(variation=0.0), Duplo(variation=0.0)
    arena2, _ = utils.stack_bricks(fixed_top, fixed_bottom)
    physics2 = Physics.from_mjcf_model(arena2.mjcf_model)
    fixed_top.initialize_episode(physics2, np.random.RandomState(0))
    ids2 = fixed_top._stud_geom_ids(physics2.model)
    got = float(np.asarray(physics2.model.geom_size)[ids2[0], 0])
    assert got == pytest.approx(sizes.lower_quartile)


def test_color_validation():
    with pytest.raises(ValueError):
        Duplo(color=(2.0, 0.0, 0.0))


def test_compiles_and_mass():
    physics, _ = _stacked_physics()
    # a real 2x4 Duplo brick weighs ~12 g
    total = float(np.asarray(physics.model.body_mass).sum())
    assert 0.015 < total < 0.035


def test_observables_shapes():
    top, bottom = Duplo(), Duplo()
    arena, frame = utils.stack_bricks(top, bottom)
    physics = Physics.from_mjcf_model(arena.mjcf_model)
    physics.forward()
    obs = top.observables
    assert obs["position"](physics).shape == (3,)
    assert obs["orientation"](physics).shape == (4,)
    pos = obs["position"](physics)
    np.testing.assert_allclose(pos[2], BRICK_HEIGHT + 0.0119, atol=1e-3)


def test_engaged_bricks_hold_under_gravity():
    physics, frame = _stacked_physics()
    physics.reset()
    z0 = float(physics.bind(frame).xpos[2])
    physics.step(100)
    z1 = float(physics.bind(frame).xpos[2])
    assert abs(z1 - z0) < 1e-3


@pytest.mark.slow
def test_engaged_bricks_resist_small_force_but_separate_under_large():
    """The separation force lies inside the real-Duplo empirical range
    (the bisection in utils.measure_separation_force does exactly this
    but needs many simulations; one bracket check keeps it test-sized).
    """
    for force, expect_separate in ((2.0, False), (40.0, True)):
        physics, frame = _stacked_physics()
        physics.reset()
        binding = physics.bind(frame)
        z0 = float(binding.xpos[2])
        wrench = np.zeros(6)
        wrench[2] = force + 0.0246 * 9.81  # compensate weight
        binding.xfrc_applied = wrench
        separated = False
        for _ in range(250):
            physics.step()
            if float(physics.bind(frame).xpos[2]) - z0 > 1e-3:
                separated = True
                break
        assert separated == expect_separate, (
            f"force {force} N: separated={separated}, "
            f"expected {expect_separate}")


@pytest.mark.slow
def test_separation_force_in_empirical_range():
    top, bottom = Duplo(), Duplo()
    for brick in (top, bottom):
        brick.initialize_episode_mjcf(np.random.RandomState(0))
    force = utils.measure_separation_force(top, bottom, tolerance=0.25)
    assert EXPECTED_MIN_FORCE / 2 < force < EXPECTED_MAX_FORCE * 2
