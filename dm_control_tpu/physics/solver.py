"""Projected Newton constraint solver (mj_solNewton analogue).

Minimizes the convex primal objective over qacc:

    c(x) = 0.5 (x - a_s)^T M (x - a_s) + sum_i s_i(J_i x - aref_i)

where a_s = qacc_smooth and s_i is, per row kind:
  - equality:      0.5 D_i jar^2                      (always active)
  - unilateral:    0.5 D_i jar^2 if jar < 0 else 0    (limits, contacts)
  - frictionloss:  Huber: quadratic inside |D jar| <= floss, linear outside

Newton steps use the exact Gauss-Newton Hessian M + J^T diag(D·active) J
(dense: nv <= ~64 per env, batched over environments → MXU), with an exact
line search on the piecewise-quadratic 1D restriction.  Early termination
matches MuJoCo's criteria (improvement / gradient below
tolerance * meaninertia * max(1, nv)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import inertia as inr
from dm_control_tpu.physics.constraints import EQUALITY, FRICTIONLOSS, LIMIT, Efc
from dm_control_tpu.physics.model import Data, DisableBit, Model


def _masks(efc: Efc):
    kind = np.array(efc.kind)
    eq = jnp.asarray(kind == EQUALITY)
    fl = jnp.asarray(kind == FRICTIONLOSS)
    uni = jnp.asarray(kind == LIMIT)
    return eq, fl, uni


def _cost_terms(efc: Efc, jar, eq, fl, uni):
    """Per-row cost, derivative weight (for grad), and Hessian weight."""
    d_ = efc.D
    quad_active = eq | (uni & (jar < 0))
    # friction loss Huber
    lin_hi = fl & (d_ * jar > efc.floss)
    lin_lo = fl & (d_ * jar < -efc.floss)
    fl_quad = fl & ~lin_hi & ~lin_lo

    quad = quad_active | fl_quad
    cost = jnp.where(quad, 0.5 * d_ * jar * jar, 0.0)
    cost = jnp.where(lin_hi, efc.floss * jar
                     - 0.5 * efc.floss ** 2 / jnp.maximum(d_, 1e-15), cost)
    cost = jnp.where(lin_lo, -efc.floss * jar
                     - 0.5 * efc.floss ** 2 / jnp.maximum(d_, 1e-15), cost)

    dcost = jnp.where(quad, d_ * jar, 0.0)
    dcost = jnp.where(lin_hi, efc.floss, dcost)
    dcost = jnp.where(lin_lo, -efc.floss, dcost)

    hess_w = jnp.where(quad, d_, 0.0)
    return cost, dcost, hess_w


def solve(m: Model, d: Data, efc: Efc) -> Data:
    dtype = d.qpos.dtype
    eq, fl, uni = _masks(efc)
    a_s = d.qacc_smooth
    M = d.qM

    def total_cost(x):
        jar = efc.J @ x - efc.aref
        cost, _, _ = _cost_terms(efc, jar, eq, fl, uni)
        dx = x - a_s
        return 0.5 * dx @ (M @ dx) + jnp.sum(cost), jar

    # warm start: pick the better of qacc_smooth and the previous qacc
    warmstart_ok = not (m.opt.disableflags & DisableBit.WARMSTART)
    c0, _ = total_cost(a_s)
    if warmstart_ok:
        cw, _ = total_cost(d.qacc_warmstart)
        x0 = jnp.where(cw < c0, d.qacc_warmstart, a_s)
        cost0 = jnp.minimum(cw, c0)
    else:
        x0 = a_s
        cost0 = c0

    scale = m.stat.meaninertia * max(1, m.nv)
    tol = m.opt.tolerance

    def cond(carry):
        x, cost, improvement, gnorm, it = carry
        return ((it < m.opt.iterations)
                & (improvement > tol * scale)
                & (gnorm > tol * scale))

    def body(carry):
        x, cost, _, _, it = carry
        jar = efc.J @ x - efc.aref
        _, dcost, hw = _cost_terms(efc, jar, eq, fl, uni)
        grad = M @ (x - a_s) + efc.J.T @ dcost
        H = M + (efc.J.T * hw) @ efc.J
        L = jnp.linalg.cholesky(H)
        y = jax.scipy.linalg.solve_triangular(L, grad, lower=True)
        p = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        # exact line search on the piecewise-quadratic φ(α)
        jp = efc.J @ p
        mp = M @ p
        p_mp = p @ mp
        x_as = x - a_s

        def phi_derivs(alpha):
            jar_a = jar + alpha * jp
            _, dcost_a, hw_a = _cost_terms(efc, jar_a, eq, fl, uni)
            d1 = (x_as + alpha * p) @ mp + jnp.sum(dcost_a * jp)
            d2 = p_mp + jnp.sum(hw_a * jp * jp)
            return d1, d2

        def ls_body(k, alpha):
            d1, d2 = phi_derivs(alpha)
            step = d1 / jnp.maximum(d2, 1e-15)
            return alpha - step

        # Newton on the piecewise-quadratic φ converges to fp precision in
        # well under 12 iterations; MuJoCo's default ls_iterations=50 would
        # only add dead kernels to the unrolled graph.
        alpha = jax.lax.fori_loop(0, min(m.opt.ls_iterations, 12), ls_body,
                                  jnp.asarray(1.0, dtype))
        alpha = jnp.clip(alpha, 0.0, 4.0)
        x_new = x + alpha * p
        cost_new, _ = total_cost(x_new)
        # guard: reject non-descent steps
        better = cost_new < cost
        x_new = jnp.where(better, x_new, x)
        cost_new = jnp.minimum(cost_new, cost)
        improvement = cost - cost_new
        gnorm = jnp.linalg.norm(grad)
        return (x_new, cost_new, improvement, gnorm, it + 1)

    init = (x0, cost0, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
    x, cost, _, _, niter = jax.lax.while_loop(cond, body, init)

    jar = efc.J @ x - efc.aref
    _, dcost, _ = _cost_terms(efc, jar, eq, fl, uni)
    efc_force = -dcost
    qfrc_constraint = efc.J.T @ efc_force

    # per-contact force recovery (mj_contactForce for pyramidal cones):
    # rows are n ± mu_i t_i in order (+t0,-t0,+t1,-t1,...), so
    #   normal  = sum_j f_j
    #   comp_i  = mu_i (f_{2i} - f_{2i+1})   (t1, t2, then torques)
    contact_force = d.contact_force
    contact_force_vec = d.contact_force_vec
    if efc.contact_spans:
        contact_force = jnp.zeros_like(d.contact_force)
        contact_force_vec = jnp.zeros_like(d.contact_force_vec)
        for conids, start, nrows in efc.contact_spans:
            k = len(conids)
            ids = jnp.asarray(conids)
            group = efc_force[start:start + k * nrows].reshape(k, nrows)
            normal = jnp.sum(group, axis=1)
            wrench = jnp.zeros((k, 6), group.dtype).at[:, 0].set(normal)
            if nrows > 1:
                nfd = nrows // 2
                mu = d.contact.friction[ids]  # (k, 5)
                diff = group[:, 0::2] - group[:, 1::2]  # (k, nfd)
                wrench = wrench.at[:, 1:1 + nfd].set(mu[:, :nfd] * diff)
            contact_force = contact_force.at[ids].set(normal)
            contact_force_vec = contact_force_vec.at[ids].set(wrench)
    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        contact_force=contact_force,
        contact_force_vec=contact_force_vec,
        solver_niter=niter,
    )
