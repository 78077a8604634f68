"""Tests for the Pallas batched Cholesky solve (ops/linalg.py).

The kernel proper runs in interpreter mode on CPU so the lane-major
algorithm is exercised here; the TPU-compiled path shares the same
trace.  Integration (solver/inertia/engine call sites route through
chol_solve under vmap) is covered by the batched suite-parity tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dm_control_tpu.ops import linalg


def _spd(rng, b, n, dtype=np.float32):
    q = rng.standard_normal((b, n, n)).astype(dtype)
    return q @ np.swapaxes(q, -1, -2) + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [2, 7, 27, 40])
def test_pallas_kernel_matches_xla(n):
    rng = np.random.default_rng(0)
    b = 64  # exercises the pad-to-1024 path
    a = _spd(rng, b, n)
    rhs = rng.standard_normal((b, n)).astype(np.float32)
    x_ref = linalg._xla_chol_solve(jnp.asarray(a), jnp.asarray(rhs))
    x_pal = linalg.chol_solve_batched(jnp.asarray(a), jnp.asarray(rhs),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)
    # against a dense solve too
    x_np = np.linalg.solve(a.astype(np.float64),
                           rhs.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x_pal), x_np, rtol=2e-3,
                               atol=2e-3)


def test_batch_not_multiple_of_block():
    rng = np.random.default_rng(1)
    b, n = 1536, 11  # 1.5 blocks
    a = _spd(rng, b, n)
    rhs = rng.standard_normal((b, n)).astype(np.float32)
    x = linalg.chol_solve_batched(jnp.asarray(a), jnp.asarray(rhs),
                                  interpret=True)
    x_np = np.linalg.solve(a.astype(np.float64),
                           rhs.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=2e-3, atol=2e-3)


def test_custom_vmap_routing():
    """vmap of the single-env chol_solve equals per-env dense solves and
    keeps working under jit + nested vmap (flattened leading dims)."""
    rng = np.random.default_rng(2)
    b, n = 12, 9
    a = jnp.asarray(_spd(rng, b, n))
    rhs = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    x = jax.jit(jax.vmap(linalg.chol_solve))(a, rhs)
    x_np = np.linalg.solve(np.asarray(a, np.float64),
                           np.asarray(rhs, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-3, atol=1e-3)

    a2 = a.reshape(3, 4, n, n)
    r2 = rhs.reshape(3, 4, n)
    x2 = jax.vmap(jax.vmap(linalg.chol_solve))(a2, r2)
    np.testing.assert_allclose(np.asarray(x2).reshape(b, n), x_np,
                               rtol=1e-3, atol=1e-3)


def test_unbatched_matrix_broadcast():
    """Matrix shared across the batch (in_batched=(False, True))."""
    rng = np.random.default_rng(3)
    n, b = 6, 5
    a = jnp.asarray(_spd(rng, 1, n)[0])
    rhs = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    x = jax.vmap(linalg.chol_solve, in_axes=(None, 0))(a, rhs)
    x_np = np.linalg.solve(np.asarray(a, np.float64),
                           np.asarray(rhs, np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-3, atol=1e-3)


def test_float64_falls_back_to_xla():
    rng = np.random.default_rng(4)
    n = 5
    a = _spd(rng, 3, n, np.float64)
    rhs = rng.standard_normal((3, n))
    old = jax.config.jax_enable_x64
    try:
        jax.config.update("jax_enable_x64", True)
        x = jax.vmap(linalg.chol_solve)(jnp.asarray(a), jnp.asarray(rhs))
    finally:
        jax.config.update("jax_enable_x64", old)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a, rhs[..., None])[..., 0],
        rtol=1e-10, atol=1e-10)
