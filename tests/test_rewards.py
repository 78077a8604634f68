"""utils.rewards vs the reference implementation (numerical oracle).

Mirrors the property tests of dm_control/utils/rewards_test.py.
"""

import numpy as np
import pytest

from dm_control_tpu.utils import rewards

ref_rewards = pytest.importorskip("dm_control.utils.rewards")

SIGMOIDS = ["gaussian", "hyperbolic", "long_tail", "reciprocal", "cosine",
            "linear", "quadratic", "tanh_squared"]


@pytest.mark.parametrize("sigmoid", SIGMOIDS)
def test_tolerance_matches_reference(sigmoid):
    x = np.linspace(-3, 3, 101)
    ours = np.asarray(rewards.tolerance(
        x, bounds=(-0.1, 0.2), margin=0.75, sigmoid=sigmoid,
        value_at_margin=0.1))
    theirs = ref_rewards.tolerance(
        x, bounds=(-0.1, 0.2), margin=0.75, sigmoid=sigmoid,
        value_at_margin=0.1)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_tolerance_hard_indicator():
    x = np.array([-1.0, 0.0, 0.5, 1.0, 2.0])
    out = np.asarray(rewards.tolerance(x, bounds=(0.0, 1.0), margin=0.0))
    np.testing.assert_array_equal(out, [0.0, 1.0, 1.0, 1.0, 0.0])


def test_tolerance_validation():
    with pytest.raises(ValueError):
        rewards.tolerance(0.0, bounds=(1.0, 0.0))
    with pytest.raises(ValueError):
        rewards.tolerance(0.0, margin=-1)
    with pytest.raises(ValueError):
        rewards.sigmoid(0.5, value_at_1=1.5, sigmoid="gaussian")
    with pytest.raises(ValueError):
        rewards.sigmoid(0.5, value_at_1=0.5, sigmoid="not_a_sigmoid")


@pytest.mark.parametrize("sigmoid", SIGMOIDS)
def test_sigmoid_boundary_values(sigmoid):
    v = 0.2
    assert np.isclose(float(rewards.sigmoid(0.0, v, sigmoid)), 1.0)
    assert np.isclose(float(rewards.sigmoid(1.0, v, sigmoid)), v)
