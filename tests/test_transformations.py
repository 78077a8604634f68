"""utils.transformations vs the installed dm_control (numerical oracle)."""

import numpy as np
import pytest

ref = pytest.importorskip("dm_control.utils.transformations")

from dm_control_tpu.utils import transformations as mine

ORDERINGS = ["XYZ", "ZYX", "XZY", "YZX", "ZXY", "YXZ", "XYX"]


def _rand_quat(rng):
    q = rng.randn(4)
    return q / np.linalg.norm(q)


def test_quaternion_ops_match():
    rng = np.random.RandomState(0)
    for _ in range(30):
        q, q2 = _rand_quat(rng), _rand_quat(rng)
        v = rng.randn(3)
        np.testing.assert_allclose(mine.quat_mul(q, q2),
                                   ref.quat_mul(q, q2), atol=1e-12)
        np.testing.assert_allclose(mine.quat_rotate(q, v),
                                   ref.quat_rotate(q, v), atol=1e-12)
        np.testing.assert_allclose(mine.quat_to_mat(q),
                                   ref.quat_to_mat(q), atol=1e-12)
        np.testing.assert_allclose(
            mine.mat_to_quat(mine.quat_to_mat(q)),
            ref.mat_to_quat(ref.quat_to_mat(q)), atol=1e-12)
        np.testing.assert_allclose(mine.quat_inv(q), ref.quat_inv(q),
                                   atol=1e-12)
        np.testing.assert_allclose(mine.quat_diff(q, q2),
                                   ref.quat_diff(q, q2), atol=1e-12)
        # the fork pins _TOL=1e-5 (reference transformations.py:23); the
        # installed oracle uses 1e-10 — pass it explicitly to compare
        np.testing.assert_allclose(mine.quat_log(q, tol=1e-10),
                                   ref.quat_log(q), atol=1e-10)


@pytest.mark.parametrize("ordering", ORDERINGS)
def test_euler_roundtrips_match(ordering):
    rng = np.random.RandomState(1)
    for _ in range(10):
        e = rng.uniform(-1.5, 1.5, 3)
        np.testing.assert_allclose(
            mine.euler_to_rmat(e, ordering), ref.euler_to_rmat(e, ordering),
            atol=1e-12)
        r = ref.euler_to_rmat(e, ordering)
        np.testing.assert_allclose(
            mine.rmat_to_euler(r, ordering), ref.rmat_to_euler(r, ordering),
            atol=1e-10)


def test_euler_to_quat_matches():
    rng = np.random.RandomState(2)
    for _ in range(10):
        e = rng.uniform(-1.5, 1.5, 3)
        np.testing.assert_allclose(mine.euler_to_quat(e),
                                   ref.euler_to_quat(e), atol=1e-12)
