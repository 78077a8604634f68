"""Batched small-matrix Cholesky solve as a Pallas TPU kernel.

The engine's three dense-solve sites (Newton step `H p = -g` in
physics/solver.py, `M qacc = qfrc` in physics/inertia.py, and the
implicit-Euler `(M + h diag(B)) v' = f` in physics/engine.py) all factor
one SPD matrix of size nv x nv (nv <= ~40 across every reference model)
per environment, vmapped over thousands of environments.  XLA lowers the
vmapped `jnp.linalg.cholesky` to a blocked loop that is tuned for big
matrices, not for "thousands of tiny ones".

The TPU-native layout for this workload is structure-of-arrays: put the
*batch* in the vector lanes and unroll the tiny factorization loop.  The
kernel below holds A as (n, n, 8, 128) VMEM tiles — every scalar of the
textbook algorithm becomes one full (8, 128) VPU tile op across 1024
environments, so utilization is 100% regardless of n, and there is no
per-element control flow at all (the j/i loops are static and fully
unrolled at trace time; n is a compile-time constant).

Exposed as `chol_solve(a, b)` via `jax.custom_batching.custom_vmap`: the
per-env call sites keep their natural single-matrix code, and when the
surrounding `vmap` batches them the rule routes to this kernel (TPU,
f32, vector rhs) or to the plain-XLA path otherwise.

Reference perf target: the reference steps physics through native
mj_step (dm_control/mujoco/engine.py:149-166); its per-process solver is
LAPACK-grade but single-env.  This kernel is what makes the *batched*
solve speed-of-light on TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128
_SUBLANES = 8
_BLOCK_B = _LANES * _SUBLANES  # 1024 envs per grid step
_TINY = 1e-30
# VMEM budget per grid step: A block + L scratch are each n*n*8*128*4B,
# b/x/y are n*8*128*4B each -> (2n^2 + 3n) * 4096 B.  n=44 gives 16.0MB
# (vs ~16.8MB VMEM); n=48 would need 19.5MB and fail to compile.  Models
# with nv > 44 (e.g. humanoid_CMU nv=62) fall back to the XLA path.
_MAX_N = 44


def _use_pallas(a, b) -> bool:
    if os.environ.get("DMCT_PALLAS", "1") == "0":
        return False
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        return False
    if a.ndim != 3 or b.ndim != 2:
        return False
    n = a.shape[-1]
    if n < 2 or n > _MAX_N:
        return False
    # below ~256 envs the pad-to-1024-lanes waste outweighs the win
    if a.shape[0] < 256:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(a_ref, b_ref, x_ref, l_ref, y_ref):
    """One grid step: factor+solve 1024 envs living in the lane/sublane
    dims.  a_ref: (n, n, 8, 128), b_ref/x_ref: (n, 8, 128)."""
    n = a_ref.shape[0]

    # Cholesky: L[j,j] = sqrt(A[j,j] - sum_k L[j,k]^2), column-by-column.
    # All slices below are static, so the whole factorization unrolls
    # into straight-line (8,128) VPU ops.
    for j in range(n):
        s = a_ref[j, j]
        if j > 0:
            lj = l_ref[j, 0:j]
            s = s - jnp.sum(lj * lj, axis=0)
        # Padded lanes carry A=0 (s == 0): clamp those to TINY so the
        # 0-rhs lanes still produce x=0.  A genuinely negative pivot
        # (non-SPD H on a bad Newton step) must propagate NaN so the
        # divergence check downstream can catch it — matching the XLA
        # cholesky's failure semantics rather than returning
        # huge-but-finite garbage.
        d = jnp.where(s > 0, jnp.sqrt(jnp.maximum(s, _TINY)),
                      jnp.where(s == 0, jnp.asarray(_TINY ** 0.5, s.dtype),
                                jnp.asarray(jnp.nan, s.dtype)))
        l_ref[j, j] = d
        if j + 1 < n:
            c = a_ref[j + 1:n, j]
            if j > 0:
                c = c - jnp.sum(l_ref[j + 1:n, 0:j]
                                * l_ref[j, 0:j][None], axis=1)
            l_ref[j + 1:n, j] = c / d[None]

    # forward substitution: L y = b
    for j in range(n):
        s = b_ref[j]
        if j > 0:
            s = s - jnp.sum(l_ref[j, 0:j] * y_ref[0:j], axis=0)
        y_ref[j] = s / l_ref[j, j]

    # back substitution: L^T x = y  (column access L[k, i] for k > i)
    for i in range(n - 1, -1, -1):
        s = y_ref[i]
        if i + 1 < n:
            s = s - jnp.sum(l_ref[i + 1:n, i] * x_ref[i + 1:n], axis=0)
        x_ref[i] = s / l_ref[i, i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_chol_solve(a, b, interpret=False):
    """a: (B, n, n) SPD, b: (B, n) -> x: (B, n), all float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = a.shape
    Bp = -(-B // _BLOCK_B) * _BLOCK_B
    if Bp != B:
        a = jnp.pad(a, ((0, Bp - B), (0, 0), (0, 0)))
        b = jnp.pad(b, ((0, Bp - B), (0, 0)))
    bs = Bp // _LANES  # sublane-rows of batch
    # batch into lanes: (n, n, bs, 128) / (n, bs, 128)
    at = jnp.transpose(a, (1, 2, 0)).reshape(n, n, bs, _LANES)
    bt = jnp.transpose(b, (1, 0)).reshape(n, bs, _LANES)

    grid = (bs // _SUBLANES,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, _SUBLANES, _LANES),
                         lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _SUBLANES, _LANES),
                         lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, _SUBLANES, _LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, bs, _LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, n, _SUBLANES, _LANES), jnp.float32),
            pltpu.VMEM((n, _SUBLANES, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(at, bt)
    x = jnp.transpose(out.reshape(n, Bp), (1, 0))
    return x[:B]


def _xla_chol_solve(a, b):
    L = jnp.linalg.cholesky(a)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)


@jax.custom_batching.custom_vmap
def chol_solve(a, b):
    """Solves the SPD system ``a @ x = b`` via Cholesky.

    Single-env signature: a (n, n), b (n,).  Under vmap the batched call
    is routed to the Pallas lane-major kernel on TPU/f32 (any leading
    batch dims, flattened), and to the XLA batched path elsewhere.
    """
    return _xla_chol_solve(a, b)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, a, b):
    a_b, b_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    n = a.shape[-1]
    lead = a.shape[:-2]
    af = a.reshape((-1, n, n))
    bf = b.reshape((-1, n))
    if _use_pallas(af, bf):
        xf = _pallas_chol_solve(af, bf)
    else:
        xf = _xla_chol_solve(af, bf)
    return xf.reshape(lead + (n,)), True


def _tri_solve(l, b):
    y = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(l, -1, -2), y, lower=False)


@jax.custom_batching.custom_vmap
def chol_factor(a):
    """Cholesky factor of ``a`` — with a twist: under vmap, when the
    fused Pallas factor+solve kernel will serve every consumer (the same
    ``_use_pallas`` predicate as ``chol_solve_factored``, evaluated on
    the same batch), the factorization is SKIPPED and ``a`` itself is
    returned as a placeholder.  The engine factors qM once per substep
    (mj_factorM) but the TPU fast path refactors inside the fused solve
    kernel, so the separate batched Cholesky is pure dead weight there —
    it only stays alive because qM's factor rides the substep loop
    carry, where XLA cannot DCE it."""
    return jnp.linalg.cholesky(a)


@chol_factor.def_vmap
def _chol_factor_vmap(axis_size, in_batched, a):
    (a_b,) = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    n = a.shape[-1]
    af = a.reshape((-1, n, n))
    bf_probe = jax.ShapeDtypeStruct((af.shape[0], n), a.dtype)
    if _use_pallas(af, bf_probe):
        return a, True  # placeholder: every solve refactors in-kernel
    return jnp.linalg.cholesky(a), True


@jax.custom_batching.custom_vmap
def chol_solve_factored(a, l, b):
    """Solves ``a @ x = b`` given ``a`` AND its Cholesky factor ``l``.

    Single-env signature: a (n, n), l (n, n) lower, b (n,).  Under vmap
    the Pallas lane-major fused factor+solve runs from ``a`` when it can
    engage (TPU, f32, n <= _MAX_N, batch >= 256); otherwise the cached
    factor is reused with two batched triangular solves — avoiding the
    re-factorization the plain `chol_solve` fallback would pay.
    """
    del a
    return _tri_solve(l, b)


@chol_solve_factored.def_vmap
def _chol_solve_factored_vmap(axis_size, in_batched, a, l, b):
    a_b, l_b, b_b = in_batched
    if not a_b:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if not l_b:
        l = jnp.broadcast_to(l, (axis_size,) + l.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    n = a.shape[-1]
    lead = a.shape[:-2]
    af = a.reshape((-1, n, n))
    bf = b.reshape((-1, n))
    if _use_pallas(af, bf):
        xf = _pallas_chol_solve(af, bf)
    else:
        xf = _tri_solve(l.reshape((-1, n, n)), bf[..., None])[..., 0]
    return xf.reshape(lead + (n,)), True


def chol_solve_batched(a, b, interpret=False):
    """Direct batched entry (a: (B, n, n), b: (B, n)) for tests/benchs.

    ``interpret=True`` runs the Pallas kernel in interpreter mode so the
    lane-major algorithm itself is testable on CPU.
    """
    if interpret or _use_pallas(a, b):
        return _pallas_chol_solve(a, b, interpret=interpret)
    return _xla_chol_solve(a, b)
