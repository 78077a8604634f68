"""Composite-rigid-body inertia: dense joint-space mass matrix + factorization.

Replaces MuJoCo's sparse CRB/LDL machinery (mj_crb/mj_factorM, reached via
dm_control's physics.step) with a dense formulation: for the small nv of
control-suite models (<= 64), a dense (nv, nv) matrix batched over
thousands of environments maps straight onto the TPU MXU, and Cholesky
solves are batched triangular solves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics.model import Data, Model


def crb(m: Model, d: Data) -> Data:
    """mj_crb: composite rigid-body inertias and the dense mass matrix.

    M[i, j] = cdof_j · (I^c_{body(i)} cdof_i) for j an ancestor-or-self of i,
    where I^c is the composite (subtree) spatial inertia.  Computed densely
    as an (nv,6)x(6,nv) product masked by the static ancestor relation.
    """
    # composite inertia = subtree sum of body spatial inertias.  On the
    # f32 throughput path this is ONE static-mask matmul (MXU) instead of
    # a per-level scalar-add chain; the f64 parity path keeps MuJoCo's
    # accumulation order bit-for-bit (tests/test_physics_oracle.py).
    from dm_control_tpu.physics.model import body_subtree_mask

    if d.qpos.dtype == jnp.float32 and m.nbody > 4:
        crb_inert = jnp.asarray(body_subtree_mask(m),
                                d.qpos.dtype) @ d.cinert  # (nbody, 10)
    else:
        acc = [d.cinert[i] for i in range(m.nbody)]
        for level in reversed(m.body_tree_levels):
            for i in level:
                p = m.body_parentid[i]
                acc[p] = acc[p] + acc[i]
        crb_inert = jnp.stack(acc)  # (nbody, 10)

    if m.nv == 0:
        return d.replace(qM=jnp.zeros((0, 0), d.qpos.dtype))

    dofbody = jnp.array(m.dof_bodyid, jnp.int32)
    # F_i = I^c_{body(i)} * cdof_i  -> (nv, 6)
    f = mx.inert_mul(crb_inert[dofbody], d.cdof)
    m_full = f @ d.cdof.T  # (nv, nv); valid where col is ancestor of row
    lower = m_full * m.dof_ancestor_mask  # keep (i, ancestor j<=i) entries
    qm = lower + lower.T - jnp.diag(jnp.diag(lower))
    qm = qm + jnp.diag(m.dof_armature)
    return d.replace(qM=qm)


def factor_m(m: Model, d: Data) -> Data:
    """Cholesky factorization of qM (mj_factorM analogue, dense).

    Routed through ops.linalg.chol_factor: on the TPU/f32 batched path
    every solve refactors inside the fused Pallas kernel, so the
    separate factorization is skipped (qLD then holds qM as a
    placeholder — consumers under the same vmap take the Pallas branch
    and never read it)."""
    from dm_control_tpu.ops import linalg as ops_linalg

    if m.nv == 0:
        return d.replace(qLD=d.qM)
    return d.replace(qLD=ops_linalg.chol_factor(d.qM))


def solve_m(m: Model, d: Data, rhs: jax.Array) -> jax.Array:
    """Solves qM x = rhs (mj_solveM).

    Vector rhs routes through ops.linalg.chol_solve_factored, whose
    custom-vmap rule swaps in the lane-major Pallas fused factor+solve
    kernel when the surrounding BatchEnv vmap batches this call on TPU
    (the fused kernel beats reusing qLD + two batched triangular solves
    by ~3-11x); when the kernel cannot engage (CPU/GPU, f64, small
    batch, DMCT_PALLAS=0) it reuses the qLD factor cached by factor_m
    instead of re-factorizing.  Matrix rhs (compile-time M^-1 columns)
    keeps the cached factor.
    """
    if rhs.ndim == 1:
        from dm_control_tpu.ops import linalg as ops_linalg

        return ops_linalg.chol_solve_factored(d.qM, d.qLD, rhs)
    # matrix rhs: qLD may be the chol_factor placeholder on the f32
    # batched path (the Pallas predicate only covers vector rhs), so
    # refactor from qM there; f64 keeps the cached factor
    l = d.qLD if d.qM.dtype == jnp.float64 else jnp.linalg.cholesky(d.qM)
    y = jax.scipy.linalg.solve_triangular(l, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, y, lower=False)


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
    """qM @ vec (mj_mulM)."""
    return d.qM @ vec
