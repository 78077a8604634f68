"""Projected Newton constraint solver (mj_solNewton analogue).

Minimizes the convex primal objective over qacc:

    c(x) = 0.5 (x - a_s)^T M (x - a_s) + sum_i s_i(J_i x - aref_i)

where a_s = qacc_smooth and s_i is, per row kind:
  - equality:      0.5 D_i jar^2                      (always active)
  - unilateral:    0.5 D_i jar^2 if jar < 0 else 0    (limits, contacts)
  - frictionloss:  Huber: quadratic inside |D jar| <= floss, linear outside
  - elliptic cone: grouped per contact (see _cone_eval) — zones matched
    empirically against mj_forward efc_force/efc_state (mujoco 3.10)

Newton steps use the exact Hessian M + J^T diag(D·active) J + cone blocks
(dense: nv <= ~64 per env, batched over environments → MXU), with an exact
line search on the piecewise-smooth 1D restriction.  Early termination
matches MuJoCo's criteria (improvement / gradient below
tolerance * meaninertia * max(1, nv)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import inertia as inr
from dm_control_tpu.physics.constraints import (
    CONE, EQUALITY, FRICTIONLOSS, LIMIT, Efc,
)
from dm_control_tpu.physics.model import Data, DisableBit, Model

_MINVAL = 1e-15


def _masks(efc: Efc):
    kind = np.array(efc.kind)
    eq = jnp.asarray(kind == EQUALITY)
    fl = jnp.asarray(kind == FRICTIONLOSS)
    uni = jnp.asarray(kind == LIMIT)
    return eq, fl, uni


def _cost_terms(efc: Efc, jar, eq, fl, uni):
    """Per-row cost, derivative weight (for grad), and Hessian weight for
    the independent (non-cone) rows; cone rows produce zeros here."""
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


def _cone_groups(efc: Efc, d: Data, impratio):
    """Precomputes static per-group arrays for the elliptic-cone spans."""
    dtype = efc.D.dtype
    groups = []
    for conids, start, dim in efc.cone_spans:
        k = len(conids)
        ids = jnp.asarray(conids)
        sl = (start, k, dim)
        fri = jnp.asarray(d.contact.friction[ids, :dim - 1], dtype)
        mu = fri[:, 0] / jnp.sqrt(jnp.asarray(impratio, dtype))
        Dg = jax.lax.dynamic_slice_in_dim(
            efc.D, start, k * dim).reshape(k, dim)
        groups.append((sl, fri, mu, Dg))
    return groups


def _cone_eval(groups, jar, need_hess=False):
    """Cost/gradient (and optionally per-contact Hessian blocks) of the
    elliptic-cone terms at ``jar``.

    Zone structure (verified against mujoco 3.10 efc_state/efc_force):
    with n = jar[0], u_j = friction_j * jar_j, t = ||u||,
    mu = friction[0]/sqrt(impratio):
      - top (separating, state 0):   n >= t           -> no cost
      - bottom (sticking, state 1):  mu^2 n + t <= 0  -> per-row quadratic
        with friction-row D = D0 * impratio * (friction_j/friction_0)^2
      - middle (sliding, state 4):   otherwise        ->
        0.5 * D0/(1+mu^2) * (n - t)^2;  force lies on the cone surface
    """
    cost = jnp.zeros((), jar.dtype)
    dparts = []
    hess = []
    for (start, k, dim), fri, mu, Dg in groups:
        jar_g = jax.lax.dynamic_slice_in_dim(
            jar, start, k * dim).reshape(k, dim)
        D0 = Dg[:, 0]
        n = jar_g[:, 0]
        u = fri * jar_g[:, 1:]
        tt = jnp.sqrt(jnp.sum(u * u, -1))
        tts = jnp.maximum(tt, _MINVAL)
        active = D0 > 0
        bottom = (mu * mu * n + tt <= 0) & active
        top = n >= tt
        mid = active & ~bottom & ~top
        dm = D0 / (1.0 + mu * mu)
        nmt = n - tt
        c_bot = 0.5 * jnp.sum(Dg * jar_g * jar_g, -1)
        c_mid = 0.5 * dm * nmt * nmt
        cost += jnp.sum(jnp.where(bottom, c_bot,
                                  jnp.where(mid, c_mid, 0.0)))
        w = fri * u / tts[:, None]  # (k, dim-1) = fri_j^2 jar_j / t
        ones = jnp.ones((k, 1), jar.dtype)
        g = jnp.concatenate([ones, -w], axis=1)  # grad of (n - t)
        d_mid = (dm * nmt)[:, None] * g
        d_bot = Dg * jar_g
        dg = jnp.where(bottom[:, None], d_bot,
                       jnp.where(mid[:, None], d_mid, 0.0))
        dparts.append((start, dg.reshape(-1)))
        if need_hess:
            # mid: dm (g g^T) + dm (t - n)/t (diag(fri^2) - w w^T) on the
            # tangent block; bottom: diag(Dg); top: 0.  PSD by zone defn.
            eye_t = jnp.eye(dim - 1, dtype=jar.dtype)
            tang = (fri[:, :, None] * fri[:, None, :] * eye_t
                    - w[:, :, None] * w[:, None, :])
            curv = jnp.zeros((k, dim, dim), jar.dtype)
            curv = curv.at[:, 1:, 1:].set(tang)
            h_mid = (dm[:, None, None] * g[:, :, None] * g[:, None, :]
                     + (dm * (tt - n) / tts)[:, None, None] * curv)
            h_bot = Dg[:, :, None] * jnp.eye(dim, dtype=jar.dtype)
            hc = jnp.where(bottom[:, None, None], h_bot,
                           jnp.where(mid[:, None, None], h_mid, 0.0))
            hess.append(hc)
    return cost, dparts, hess


def _scatter(dcost, dparts):
    for start, dg in dparts:
        dcost = jax.lax.dynamic_update_slice_in_dim(dcost, dg, start, 0)
    return dcost


def _noslip(m: Model, d: Data, efc: Efc, a_s, x, efc_force):
    """Noslip post-pass (mj_noSlip, reference engine hot loop via
    ``option noslip_iterations`` — e.g. suite dog.xml).

    A modified PGS over the FRICTION variables only, using the
    UNREGULARIZED dual (A = J M^-1 J^T, residual = J qacc - aref):

    - dof/tendon friction-loss rows get a 1-D Gauss-Seidel update
      clamped to [-frictionloss, +frictionloss];
    - each pyramidal contact is reparameterized as fixed pair-sums
      (preserving the normal force) plus free pair-differences
      y_j = (f_{2j} - f_{2j+1})/2, solved jointly per contact as an
      (nfd, nfd) Newton step and clamped to |y_j| <= mid_j (keeping
      every pyramid-edge force >= 0).

    Inactive carried rows (D == 0, dist >= margin) have zero force, so
    mid = 0 clamps their update away — matching MuJoCo, which does not
    instantiate those rows at all.
    """
    dtype = x.dtype
    minv_jt = inr.solve_m(m, d, efc.J.T)  # (nv, nefc)
    minv_jt_t = minv_jt.T  # (nefc, nv) — row-sliceable per contact
    kind = np.asarray(efc.kind)
    fl_rows = np.nonzero(kind == FRICTIONLOSS)[0]
    pyr_spans = [s for s in efc.contact_spans if s[2] > 1]
    if not fl_rows.size and not pyr_spans:
        return efc_force, x

    def one_iter(_, carry):
        f, qacc = carry
        # dof/tendon friction rows: sequential 1-D updates
        for i in map(int, fl_rows):
            res = efc.J[i] @ qacc - efc.aref[i]
            a_ii = efc.J[i] @ minv_jt[:, i]
            fnew = jnp.clip(f[i] - res / jnp.maximum(a_ii, _MINVAL),
                            -efc.floss[i], efc.floss[i])
            delta = fnew - f[i]
            f = f.at[i].set(fnew)
            qacc = qacc + minv_jt[:, i] * delta

        # pyramidal contacts: joint pair-difference update per contact
        # (sequential Gauss-Seidel — the trip count is the static carried
        # contact count, the body one dynamic-slice block)
        for conids, start, nrows in pyr_spans:
            nfd = nrows // 2

            def con_body(c, carry, start=start, nrows=nrows, nfd=nfd):
                f, qacc = carry
                r0 = start + c * nrows
                Jg = jax.lax.dynamic_slice_in_dim(
                    efc.J, r0, nrows)  # (nrows, nv)
                ag = jax.lax.dynamic_slice_in_dim(efc.aref, r0, nrows)
                fg = jax.lax.dynamic_slice_in_dim(f, r0, nrows)
                mjt = jax.lax.dynamic_slice_in_dim(
                    minv_jt_t, r0, nrows)  # (nrows, nv)
                # pair decomposition: f_{2j} = mid_j + y_j,
                # f_{2j+1} = mid_j - y_j; sequential 1-D Gauss-Seidel
                # over the pairs (each pair sees the previous pair's
                # updated residual)
                mid = 0.5 * (fg[0::2] + fg[1::2])  # (nfd,)
                y = 0.5 * (fg[0::2] - fg[1::2])
                A = Jg @ mjt.T  # (nrows, nrows)
                f_new = fg
                for j in range(nfd):
                    res = Jg @ qacc - ag  # (nrows,)
                    grad_j = res[2 * j] - res[2 * j + 1]
                    h_jj = (A[2 * j, 2 * j] - 2 * A[2 * j, 2 * j + 1]
                            + A[2 * j + 1, 2 * j + 1])
                    y_j = y[j] - grad_j / jnp.maximum(h_jj, _MINVAL)
                    y_j = jnp.where(mid[j] > 0,
                                    jnp.clip(y_j, -mid[j], mid[j]),
                                    jnp.zeros((), dtype))
                    dpair = jnp.stack([mid[j] + y_j - f_new[2 * j],
                                       mid[j] - y_j - f_new[2 * j + 1]])
                    f_new = (f_new.at[2 * j].set(mid[j] + y_j)
                                  .at[2 * j + 1].set(mid[j] - y_j))
                    qacc = qacc + dpair @ mjt[2 * j:2 * j + 2]
                f = jax.lax.dynamic_update_slice_in_dim(f, f_new, r0, 0)
                return f, qacc

            f, qacc = jax.lax.fori_loop(0, len(conids), con_body,
                                        (f, qacc))
        return f, qacc

    f, qacc = jax.lax.fori_loop(0, int(m.opt.noslip_iterations), one_iter,
                                (efc_force, x))
    return f, qacc


def solve(m: Model, d: Data, efc: Efc) -> Data:
    dtype = d.qpos.dtype
    eq, fl, uni = _masks(efc)
    cone_groups = _cone_groups(efc, d, m.opt.impratio)
    a_s = d.qacc_smooth
    M = d.qM

    def cost_from_jar(x, jar):
        """Total cost given the row-space residual jar = J x - aref —
        the J-free evaluation the Newton loop uses (jar is maintained
        incrementally, the way native mj_solNewton does)."""
        cost, _, _ = _cost_terms(efc, jar, eq, fl, uni)
        ccost, _, _ = _cone_eval(cone_groups, jar)
        dx = x - a_s
        # cast: with a wider-dtype model the row math promotes, but the
        # loop carries must stay in the data dtype
        return jnp.asarray(0.5 * dx @ (M @ dx) + jnp.sum(cost) + ccost,
                           dtype)

    def total_cost(x):
        jar = jnp.asarray(efc.J @ x - efc.aref, dtype)
        return cost_from_jar(x, jar), jar

    # warm start: pick the better of qacc_smooth and the previous qacc
    warmstart_ok = not (m.opt.disableflags & DisableBit.WARMSTART)
    c0, jar_s = total_cost(a_s)
    if warmstart_ok:
        cw, jar_w = total_cost(d.qacc_warmstart)
        take_w = cw < c0
        x0 = jnp.where(take_w, d.qacc_warmstart, a_s)
        jar0 = jnp.where(take_w, jar_w, jar_s)
        cost0 = jnp.minimum(cw, c0)
    else:
        x0 = a_s
        jar0 = jar_s
        cost0 = c0

    scale = m.stat.meaninertia * max(1, m.nv)
    tol = m.opt.tolerance

    def cond(carry):
        x, jar, cost, improvement, gnorm, it = carry
        return ((it < m.opt.iterations)
                & (improvement > tol * scale)
                & (gnorm > tol * scale))

    def body(carry):
        x, jar, cost, _, _, it = carry
        _, dcost, hw = _cost_terms(efc, jar, eq, fl, uni)
        ccost, dparts, hblocks = _cone_eval(cone_groups, jar,
                                            need_hess=True)
        dcost = _scatter(dcost, dparts)
        grad = jnp.asarray(M @ (x - a_s) + efc.J.T @ dcost, dtype)
        H = M + (efc.J.T * hw) @ efc.J
        for ((start, k, dim), *_), hc in zip(cone_groups, hblocks):
            Jg = jax.lax.dynamic_slice_in_dim(
                efc.J, start, k * dim).reshape(k, dim, m.nv)
            H = H + jnp.einsum("kiv,kij,kjw->vw", Jg, hc, Jg)
        from dm_control_tpu.ops import linalg as ops_linalg

        p = -jnp.asarray(
            ops_linalg.chol_solve(H, jnp.asarray(grad, H.dtype)), dtype)

        # exact line search on the piecewise-smooth φ(α)
        # cast: a wider-dtype model J would promote the carried jar
        jp = jnp.asarray(efc.J @ p, dtype)
        mp = M @ p
        p_mp = p @ mp
        x_as = x - a_s

        def phi_derivs(alpha):
            jar_a = jar + alpha * jp
            _, dcost_a, hw_a = _cost_terms(efc, jar_a, eq, fl, uni)
            _, dparts_a, hb_a = _cone_eval(cone_groups, jar_a,
                                           need_hess=True)
            dcost_a = _scatter(dcost_a, dparts_a)
            d1 = (x_as + alpha * p) @ mp + jnp.sum(dcost_a * jp)
            d2 = p_mp + jnp.sum(hw_a * jp * jp)
            for ((start, k, dim), *_), hc in zip(cone_groups, hb_a):
                jp_g = jax.lax.dynamic_slice_in_dim(
                    jp, start, k * dim).reshape(k, dim)
                d2 = d2 + jnp.einsum("ki,kij,kj->", jp_g, hc, jp_g)
            return jnp.asarray(d1, dtype), jnp.asarray(d2, dtype)

        # Line-search depth is dtype-tiered: each round at least halves
        # the bracket (bisection; Newton is quadratic away from zone
        # kinks).  12 rounds resolve alpha past fp32 precision and cost
        # 13% less humanoid throughput than 25 — and are still far
        # tighter than MuJoCo's own LS (ls_tolerance=1% early exit).
        # The f64 oracle-parity path keeps 25 rounds: at a kinked
        # minimizer bisection is linear, and 2^-12 alpha precision
        # flips contact boundaries a few steps later (seen on
        # manipulator:bring_ball).
        import os as _os
        if dtype == jnp.float64:
            nls = max(min(m.opt.ls_iterations, 25), 12)
            ngrow = 10
        else:
            nls = max(min(m.opt.ls_iterations, 12), 8)
            nls = int(_os.environ.get("DMCT_NLS", nls))
            ngrow = int(_os.environ.get("DMCT_NGROW", 10))

        # Safeguarded exact line search: φ is convex and piecewise
        # smooth (zone switches in cone/limit rows make plain 1D
        # Newton cycle and stall far from the minimizer).  Bracket
        # the root of φ' by doubling, then interleave Newton steps
        # with bisection, keeping the bracket invariant
        # φ'(lo) < 0 < φ'(hi).  (A fused 11-candidate bracket
        # evaluation was measured perf-neutral here: the K x nefc
        # broadcast costs what the latency win saves.)
        # Both line-search loops are STATICALLY UNROLLED rather than
        # lax.fori_loop'd: a fori_loop body inside the Newton while_loop
        # re-launches its ~7 small kernels every round (~150 launches
        # per Newton iteration); unrolled, XLA fuses the ~22 dependent
        # elementwise evaluations over the (nefc,) rows into a handful
        # of kernels.  The math is identical round for round.
        one = jnp.asarray(1.0, dtype)

        def grow_body(carry):
            hi, d1_hi = carry
            hi2 = jnp.where(d1_hi < 0, hi * 2.0, hi)
            d1_hi2, _ = phi_derivs(hi2)
            take = d1_hi < 0
            return (jnp.where(take, hi2, hi),
                    jnp.where(take, d1_hi2, d1_hi))

        d1_1, _ = phi_derivs(one)
        carry = (one, d1_1)
        for _ in range(ngrow):
            carry = grow_body(carry)
        hi, d1_hi = carry
        # the last grow point with phi' < 0 is hi/2 (or 0 when the
        # bracket was [0, 1] from the start) — a free 2x tighter start
        lo0 = jnp.where(d1_1 < 0, hi * 0.5, jnp.zeros((), dtype))

        def ls_body(carry):
            lo, hi, alpha = carry
            d1, d2 = phi_derivs(alpha)
            lo = jnp.where(d1 < 0, alpha, lo)
            hi = jnp.where(d1 > 0, alpha, hi)
            newton = alpha - d1 / jnp.maximum(d2, _MINVAL)
            mid = 0.5 * (lo + hi)
            inside = (newton >= lo) & (newton <= hi)
            nxt = jnp.where(inside, newton, mid)
            return lo, hi, jnp.where(d1 == 0, alpha, nxt)

        carry = (lo0, hi, 0.5 * (lo0 + hi))
        for _ in range(nls):
            carry = ls_body(carry)
        _, _, alpha = carry
        x_new = x + alpha * p
        # J-free cost at the candidate: jar updates incrementally
        # (jar' = jar + alpha jp), saving two full J passes per trip
        jar_new = jar + alpha * jp
        cost_new = cost_from_jar(x_new, jar_new)
        # guard: reject non-descent steps
        better = cost_new < cost
        x_new = jnp.where(better, x_new, x)
        jar_new = jnp.where(better, jar_new, jar)
        cost_new = jnp.minimum(cost_new, cost)
        improvement = cost - cost_new
        gnorm = jnp.linalg.norm(grad)
        return (x_new, jar_new, cost_new, improvement, gnorm, it + 1)

    init = (x0, jar0, cost0, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
    x, _jar_c, cost, _, _, niter = jax.lax.while_loop(cond, body, init)

    jar = efc.J @ x - efc.aref
    _, dcost, _ = _cost_terms(efc, jar, eq, fl, uni)
    _, dparts, _ = _cone_eval(cone_groups, jar)
    dcost = _scatter(dcost, dparts)
    efc_force = -dcost

    if int(getattr(m.opt, "noslip_iterations", 0) or 0) > 0:
        efc_force, x = _noslip(m, d, efc, a_s, x, efc_force)

    qfrc_constraint = efc.J.T @ efc_force

    # per-contact force recovery (mj_contactForce):
    # pyramidal — rows are n ± mu_i t_i in order (+t0,-t0,+t1,-t1,...), so
    #   normal  = sum_j f_j
    #   comp_i  = mu_i (f_{2i} - f_{2i+1})   (t1, t2, then torques)
    # elliptic — rows ARE the contact-frame force components directly
    contact_force = d.contact_force
    contact_force_vec = d.contact_force_vec
    if efc.sel_spans:
        # compacted contacts: scatter group forces back to the full
        # candidate arrays through the traced selection indices
        contact_force = jnp.zeros_like(d.contact_force)
        contact_force_vec = jnp.zeros_like(d.contact_force_vec)
        for sel_off, start, nrows, k in efc.sel_spans:
            ids = efc.contact_selids[sel_off:sel_off + k]
            group = efc_force[start:start + k * nrows].reshape(k, nrows)
            normal = jnp.sum(group, axis=1)
            wrench = jnp.zeros((k, 6), group.dtype).at[:, 0].set(normal)
            if nrows > 1:
                nfd = nrows // 2
                mu = d.contact.friction[ids]  # (k, 5)
                diff = group[:, 0::2] - group[:, 1::2]
                wrench = wrench.at[:, 1:1 + nfd].set(mu[:, :nfd] * diff)
            contact_force = contact_force.at[ids].set(normal)
            contact_force_vec = contact_force_vec.at[ids].set(wrench)
    if efc.contact_spans or efc.cone_spans:
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
        for conids, start, dim in efc.cone_spans:
            k = len(conids)
            ids = jnp.asarray(conids)
            group = efc_force[start:start + k * dim].reshape(k, dim)
            wrench = jnp.zeros((k, 6), group.dtype).at[:, :dim].set(group)
            contact_force = contact_force.at[ids].set(group[:, 0])
            contact_force_vec = contact_force_vec.at[ids].set(wrench)
    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc_constraint,
        contact_force=contact_force,
        contact_force_vec=contact_force_vec,
        solver_niter=niter,
    )
