"""Fused scalar-chain fast path: the whole physics step as one SSA graph.

The general engine (kinematics/inertia/dynamics/constraints/solver) is
written over (nbody, ...) arrays with gather/scatter indexing so one code
path serves every model.  For tiny models that structure is the
bottleneck on TPU: a batched cartpole step compiles to ~1250 fused
kernels, and at ~5-20us launch+HBM-roundtrip per kernel the rollout is
kernel-count bound, not FLOP bound (measured: 28ms per 8192-env step,
of which the arithmetic is microseconds).

This module re-derives the exact same step — same formulas, same
constants, verified to f32 round-off against the general engine — as a
single-environment straight-line program: every per-body / per-dof
quantity is its own SSA value, all indexing is resolved at trace time
from the static Model (numpy), and there are no gathers, scatters,
stacks, or linalg calls (small Cholesky factorizations are unrolled to
scalar arithmetic).  Under jax.vmap every value becomes a (B,)-shaped
lane and XLA fuses the whole step into a handful of elementwise kernels.

Applicability (checked statically by ``applicable``): scalar joints only
(hinge/slide), no tendons/equality/activation states, joint-transmission
fixed-gain actuators, no possible contact rows, Euler or RK4.  This
covers the suite's classic-control tier (pendulum, cartpole variants,
reacher, ...).  Models that fall outside use the general engine
unchanged.

Reference semantics mirrored from: physics/kinematics.py (FK, com_pos,
com_vel), inertia.py (CRB), dynamics.py (RNE, passive), actuation.py,
constraints.py (limit rows, kbi), solver.py (projected Newton + exact
line search), engine.py (euler implicit damping, RK4 tableau) — which in
turn cite the MuJoCo originals.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics.model import (BiasType, DisableBit, DynType,
                                          GainType, IntegratorType,
                                          JointType, Model, SensorType,
                                          TrnType)

_MINVAL = 1e-15
_MINIMP, _MAXIMP = 0.0001, 0.9999

#: model_diff fields the fast path supports as traced per-episode inputs —
#: they only reposition geoms/sites for observation FK and never enter the
#: dynamics (geom masses were folded into body inertia at compile).
DIFF_SAFE_FIELDS = frozenset(
    {"geom_pos", "geom_quat", "site_pos", "site_quat"})


#: sensor types whose values depend on accelerations / constraint forces
#: computed inside the step (mj_sensorAcc stage) — the fast path doesn't
#: materialize contact_force/qacc into Data, so these would read zeros.
_ACC_STAGE_SENSORS = frozenset({
    int(SensorType.TOUCH), int(SensorType.ACCELEROMETER),
    int(SensorType.FORCE), int(SensorType.TORQUE),
    int(SensorType.FRAMELINACC), int(SensorType.FRAMEANGACC),
    int(SensorType.ACTUATORFRC)})

_MAX_CONTACT_ROWS = 160  # solver rows; cheetah = 140


def _contact_pairs_static(m: Model):
    """Static per-pair contact description (or None if unsupported):
    list of (fn, nrows, g1, g2, condim, friction5, solref, solimp,
    includemargin, invweight)."""
    from dm_control_tpu.physics import collision

    groups = collision.contact_groups(m)
    out = []
    body_invw = np.asarray(m.body_invweight0, np.float64)
    for key, nrows, pairs in groups:
        fn, _ = collision._resolve_collider(m, key)
        if fn is None or isinstance(fn, tuple):  # hfield closure et al.
            return None
        fri, sr, si, incm = collision._pair_params_arrays(m, pairs)
        fri, sr, si, incm = (np.asarray(fri, np.float64),
                             np.asarray(sr, np.float64),
                             np.asarray(si, np.float64),
                             np.asarray(incm, np.float64))
        for i, pair in enumerate(pairs):
            g1, g2 = int(pair[0]), int(pair[1])
            condim = int(pair[2]) if len(pair) > 2 else 3
            if condim not in (1, 3):
                return None
            b1 = int(m.geom_bodyid[g1])
            b2 = int(m.geom_bodyid[g2])
            inv = float(body_invw[b1, 0] + body_invw[b2, 0])
            out.append(dict(fn=fn, nrows=nrows, g1=g1, g2=g2,
                            condim=condim, friction=fri[i], solref=sr[i],
                            solimp=si[i], includemargin=float(incm[i]),
                            invweight=inv))
    return out


def applicable(m: Model) -> bool:
    """True when the fused scalar-chain step reproduces engine.step."""
    try:
        if m.njnt == 0 or m.nv != m.njnt or m.na != 0:
            return False
        if m.nv > 10 or m.ntendon != 0 or getattr(m, "neq", 0) != 0:
            return False
        if any(int(t) not in (int(JointType.HINGE), int(JointType.SLIDE))
               for t in np.asarray(m.jnt_type)):
            return False
        pairs = _contact_pairs_static(m)
        if pairs is None:
            return False
        # nrows = contacts per pair from the collider; condim 3 expands
        # each contact into 4 pyramidal solver rows
        if sum(p["nrows"] * (1 if p["condim"] == 1 else 4)
               for p in pairs) > _MAX_CONTACT_ROWS:
            return False
        if any(int(t) in _ACC_STAGE_SENSORS for t in m.sensor_type):
            return False
        if np.any(np.asarray(m.dof_frictionloss) != 0):
            return False
        for u in range(m.nu):
            if int(m.actuator_trntype[u]) not in (
                    int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
                return False
            if int(m.actuator_dyntype[u]) != int(DynType.NONE):
                return False
            if int(np.asarray(m.actuator_gaintype)[u]) != int(
                    GainType.FIXED):
                return False
            if int(np.asarray(m.actuator_biastype)[u]) != int(
                    BiasType.NONE):
                return False
        integ = int(np.asarray(m.opt.integrator))
        if integ not in (int(IntegratorType.EULER),
                         int(IntegratorType.RK4)):
            return False
        # Disable bits the fast path models: CONTACT (contact_groups is
        # already empty), FILTERPARENT (a pair-filter input), CONSTRAINT /
        # LIMIT (row construction is skipped to match, see build_step).
        harmless = (int(DisableBit.CONTACT) | int(DisableBit.FILTERPARENT)
                    | int(DisableBit.CONSTRAINT) | int(DisableBit.LIMIT))
        if int(np.asarray(m.opt.disableflags)) & ~harmless:
            return False
        if float(np.asarray(m.opt.density)) != 0.0 or \
                float(np.asarray(m.opt.viscosity)) != 0.0:
            return False
        if np.any(np.asarray(m.opt.wind) != 0.0):
            return False
        return True
    except Exception:
        return False


# -- unrolled small linear algebra ------------------------------------------


def _chol_solve(M, rhs, n):
    """Solves M x = rhs with M given as an n x n nested list of scalars
    (symmetric PD) and rhs a list of scalars — fully unrolled."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, _MINVAL))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def build_step(m: Model):
    """Returns step1(qpos, qvel, warmstart, ctrl) -> (qpos', qvel', warm')
    for a single environment, or None if the model doesn't qualify.

    All Model metadata is read into numpy here; the returned closure
    contains only static python structure + jnp scalar arithmetic.
    """
    if not applicable(m):
        return None

    nbody, njnt, nv, nu = m.nbody, m.njnt, int(m.nv), int(m.nu)
    parent = [int(b) for b in np.asarray(m.body_parentid)]
    body_pos = np.asarray(m.body_pos, np.float64)
    body_quat = np.asarray(m.body_quat, np.float64)
    body_mass = np.asarray(m.body_mass, np.float64)
    body_inertia = np.asarray(m.body_inertia, np.float64)
    body_ipos = np.asarray(m.body_ipos, np.float64)
    body_iquat = np.asarray(m.body_iquat, np.float64)
    body_rootid = [int(b) for b in np.asarray(m.body_rootid)]
    subtreemass = np.asarray(m.body_subtreemass, np.float64)
    jnt_bodyid = [int(j) for j in np.asarray(m.jnt_bodyid)]
    jnt_type = [int(t) for t in np.asarray(m.jnt_type)]
    jnt_axis = np.asarray(m.jnt_axis, np.float64)
    jnt_pos = np.asarray(m.jnt_pos, np.float64)
    jnt_qposadr = [int(a) for a in np.asarray(m.jnt_qposadr)]
    jnt_dofadr = [int(a) for a in np.asarray(m.jnt_dofadr)]
    qpos0 = np.asarray(m.qpos0, np.float64)
    qpos_spring = np.asarray(m.qpos_spring, np.float64)
    jnt_stiffness = np.asarray(m.jnt_stiffness, np.float64)
    dof_damping = np.asarray(m.dof_damping, np.float64)
    dof_armature = np.asarray(m.dof_armature, np.float64)
    dof_invweight0 = np.asarray(m.dof_invweight0, np.float64)
    gravity = np.asarray(m.opt.gravity, np.float64)
    dt = float(np.asarray(m.opt.timestep))
    integ = int(np.asarray(m.opt.integrator))
    tol = float(np.asarray(m.opt.tolerance))
    iterations = int(np.asarray(m.opt.iterations))
    ls_iterations = min(int(np.asarray(m.opt.ls_iterations)), 12)
    meaninertia = float(np.asarray(m.stat.meaninertia))
    scale = meaninertia * max(1, nv)

    # joints of each body, in order
    body_joints = [[] for _ in range(nbody)]
    for j in range(njnt):
        body_joints[jnt_bodyid[j]].append(j)
    # ancestor dof chains (dofs are 1:1 with joints here)
    def chain(b):
        out = []
        while b != 0:
            out.extend(jnt_dofadr[j] for j in body_joints[b])
            b = parent[b]
        return sorted(out)
    body_chain = [chain(b) for b in range(nbody)]
    dof_body = [0] * nv
    for j in range(njnt):
        dof_body[jnt_dofadr[j]] = jnt_bodyid[j]
    # topological order (parents first) — model compiler guarantees it
    order = list(range(1, nbody))

    # actuators
    act_jid = [int(m.actuator_trnid[u][0]) for u in range(nu)]
    act_gear0 = np.asarray(m.actuator_gear, np.float64)[:, 0] if nu else []
    act_ctrllim = [bool(l) for l in np.asarray(m.actuator_ctrllimited)] \
        if nu else []
    act_ctrlrange = np.asarray(m.actuator_ctrlrange, np.float64) if nu \
        else []
    act_forcelim = [bool(l) for l in np.asarray(m.actuator_forcelimited)] \
        if nu else []
    act_forcerange = np.asarray(m.actuator_forcerange, np.float64) if nu \
        else []

    # limit rows (static): (dof, sign, lo/hi bound, margin, solref, solimp)
    limit_rows = []
    jnt_range = np.asarray(m.jnt_range, np.float64)
    jnt_margin = np.asarray(m.jnt_margin, np.float64)
    jnt_solref = np.asarray(m.jnt_solref, np.float64)
    jnt_solimp = np.asarray(m.jnt_solimp, np.float64)
    for j in range(njnt):
        if not int(np.asarray(m.jnt_limited)[j]):
            continue
        dadr = jnt_dofadr[j]
        limit_rows.append((jnt_qposadr[j], dadr, +1.0, jnt_range[j, 0],
                           jnt_margin[j], jnt_solref[j], jnt_solimp[j],
                           dof_invweight0[dadr]))
        limit_rows.append((jnt_qposadr[j], dadr, -1.0, jnt_range[j, 1],
                           jnt_margin[j], jnt_solref[j], jnt_solimp[j],
                           dof_invweight0[dadr]))
    nefc = len(limit_rows)

    def _kbi(solref, solimp, pos):
        """constraints.kbi on scalars (reference constraints.py:60-90)."""
        dmin, dmax, width, mid, power = solimp
        x = jnp.clip(jnp.abs(pos) / max(width, _MINVAL), 0.0, 1.0)
        mid = min(max(mid, _MINIMP), _MAXIMP)
        power = max(power, 1.0)
        y_lo = (x / mid) ** power * mid
        y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
        y = jnp.where(x < mid, y_lo, y_hi)
        imp = jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)
        dmax_c = min(max(dmax, _MINIMP), _MAXIMP)
        timeconst, dampratio = float(solref[0]), float(solref[1])
        if timeconst <= 0:  # direct
            k = -timeconst * imp
            b = -dampratio
        else:
            tc = max(timeconst, 2.0 * dt)
            k = imp / max((dmax_c * tc * dampratio) ** 2, _MINVAL)
            b = 2.0 / max(dmax_c * tc, _MINVAL)
        return k, b, imp

    def fk(qpos):
        """FK (kinematics.py:50) as per-body SSA values."""
        dtype = qpos.dtype
        q = [qpos[i] for i in range(nv)]
        xpos = [jnp.zeros(3, dtype)] * nbody
        xquat = [None] * nbody
        xquat[0] = jnp.array([1.0, 0, 0, 0], dtype)
        xanchor = [None] * njnt
        xaxis = [None] * njnt
        for b in order:
            p = parent[b]
            pq = xquat[p]
            pos = xpos[p] + mx.rotate(jnp.asarray(body_pos[b], dtype), pq)
            quat = pq if np.allclose(body_quat[b], [1, 0, 0, 0]) else \
                mx.quat_mul(pq, jnp.asarray(body_quat[b], dtype))
            for j in body_joints[b]:
                qadr = jnt_qposadr[j]
                jp = jnp.asarray(jnt_pos[j], dtype)
                ja = jnp.asarray(jnt_axis[j], dtype)
                if jnt_type[j] == int(JointType.SLIDE):
                    axis_w = mx.rotate(ja, quat)
                    pos = pos + axis_w * (q[qadr] - qpos0[qadr])
                    xanchor[j] = pos + mx.rotate(jp, quat)
                    xaxis[j] = axis_w
                else:  # HINGE
                    anchor = pos + mx.rotate(jp, quat)
                    angle = q[qadr] - qpos0[qadr]
                    quat = mx.quat_mul(
                        quat, mx.axis_angle_to_quat(ja, angle))
                    pos = anchor - mx.rotate(jp, quat)
                    xanchor[j] = anchor
                    xaxis[j] = mx.rotate(ja, quat)
            xpos[b] = pos
            xquat[b] = quat
        return xpos, xquat, xanchor, xaxis

    geom_bodyid = [int(b) for b in np.asarray(m.geom_bodyid)] \
        if m.ngeom else []
    geom_pos = np.asarray(m.geom_pos, np.float64) if m.ngeom else None
    geom_quat = np.asarray(m.geom_quat, np.float64) if m.ngeom else None
    site_bodyid = [int(b) for b in np.asarray(m.site_bodyid)] \
        if m.nsite else []
    site_pos = np.asarray(m.site_pos, np.float64) if m.nsite else None
    site_quat = np.asarray(m.site_quat, np.float64) if m.nsite else None

    def fk_fields(qpos, diff=None):
        """Stacked kinematics() output fields for observation/reward
        (the fields engine.fwd_position materializes in Data).

        ``diff`` may override DIFF_SAFE_FIELDS (per-episode model_diff
        values that only reposition geoms/sites — they never enter the
        dynamics, whose mass properties were folded at compile)."""
        diff = diff or {}
        dtype = qpos.dtype
        xpos, xquat, xanchor, xaxis = fk(qpos)
        xmat = [mx.quat_to_mat(xquat[b]) for b in range(nbody)]
        xipos = [xpos[b] + xmat[b] @ jnp.asarray(body_ipos[b], dtype)
                 for b in range(nbody)]
        ximat = [xmat[b] if np.allclose(body_iquat[b], [1, 0, 0, 0])
                 else xmat[b] @ mx.quat_to_mat(
                     jnp.asarray(body_iquat[b], dtype))
                 for b in range(nbody)]
        out = dict(
            xpos=jnp.stack(xpos), xquat=jnp.stack(xquat),
            xmat=jnp.stack(xmat), xipos=jnp.stack(xipos),
            ximat=jnp.stack(ximat),
            jnt_xanchor=jnp.stack(xanchor), jnt_xaxis=jnp.stack(xaxis))
        def local_pos(field, const, i):
            if field in diff:
                return jnp.asarray(diff[field][i], dtype)
            return jnp.asarray(const[i], dtype)

        def local_mat(field, const, i, base):
            if field in diff:
                return base @ mx.quat_to_mat(
                    mx.quat_normalize(jnp.asarray(diff[field][i], dtype)))
            if np.allclose(const[i], [1, 0, 0, 0]):
                return base
            return base @ mx.quat_to_mat(jnp.asarray(const[i], dtype))

        if m.ngeom:
            out["geom_xpos"] = jnp.stack([
                xpos[geom_bodyid[g]] + xmat[geom_bodyid[g]]
                @ local_pos("geom_pos", geom_pos, g)
                for g in range(m.ngeom)])
            out["geom_xmat"] = jnp.stack([
                local_mat("geom_quat", geom_quat, g,
                          xmat[geom_bodyid[g]]) for g in range(m.ngeom)])
        if m.nsite:
            out["site_xpos"] = jnp.stack([
                xpos[site_bodyid[s]] + xmat[site_bodyid[s]]
                @ local_pos("site_pos", site_pos, s)
                for s in range(m.nsite)])
            out["site_xmat"] = jnp.stack([
                local_mat("site_quat", site_quat, s,
                          xmat[site_bodyid[s]]) for s in range(m.nsite)])
        return out

    def smooth(qpos, qvel, ctrl):
        """FK + CRB + RNE + passive + actuation; returns
        (M nested-list, qfrc_smooth list, qacc_smooth list)."""
        dtype = qpos.dtype
        q = [qpos[i] for i in range(nv)]
        v = [qvel[i] for i in range(nv)]

        xpos, xquat, xanchor, xaxis = fk(qpos)
        xmat = [None] * nbody
        xipos = [None] * nbody
        ximat = [None] * nbody
        for b in range(nbody):
            xm = mx.quat_to_mat(xquat[b])
            xmat[b] = xm
            xipos[b] = xpos[b] + xm @ jnp.asarray(body_ipos[b], dtype)
            ximat[b] = (xm if np.allclose(body_iquat[b], [1, 0, 0, 0])
                        else xm @ mx.quat_to_mat(
                            jnp.asarray(body_iquat[b], dtype)))

        # ---- com_pos (kinematics.py:130) ----
        acc = [body_mass[b] * xipos[b] for b in range(nbody)]
        for b in reversed(order):
            acc[parent[b]] = acc[parent[b]] + acc[b]
        subtree_com = [acc[b] / max(subtreemass[b], _MINVAL)
                       for b in range(nbody)]
        cinert = [None] * nbody
        for b in range(nbody):
            offset = xipos[b] - subtree_com[body_rootid[b]]
            cinert[b] = mx.inert_from_body(
                jnp.asarray(body_mass[b], dtype),
                jnp.asarray(body_inertia[b], dtype), offset, ximat[b])
        cdof = [None] * nv
        for j in range(njnt):
            dadr = jnt_dofadr[j]
            com = subtree_com[body_rootid[jnt_bodyid[j]]]
            if jnt_type[j] == int(JointType.SLIDE):
                cdof[dadr] = jnp.concatenate(
                    [jnp.zeros(3, dtype), xaxis[j]])
            else:
                cdof[dadr] = jnp.concatenate(
                    [xaxis[j], jnp.cross(xaxis[j], com - xanchor[j])])

        # ---- CRB (inertia.py:19) ----
        crb = list(cinert)
        for b in reversed(order):
            crb[parent[b]] = crb[parent[b]] + crb[b]
        M = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            f_i = mx.inert_mul(crb[dof_body[i]], cdof[i])
            for jdof in body_chain[dof_body[i]]:
                if jdof <= i:
                    M[i][jdof] = jnp.dot(f_i, cdof[jdof])
                    M[jdof][i] = M[i][jdof]
        for i in range(nv):
            M[i][i] = M[i][i] + dof_armature[i]
            for jdof in range(nv):
                if M[i][jdof] is None:
                    M[i][jdof] = jnp.zeros((), dtype)

        # ---- com_vel (kinematics.py:181) ----
        cvel = [jnp.zeros(6, dtype)] * nbody
        cdof_dot = [None] * nv
        for b in order:
            vel = cvel[parent[b]]
            for j in body_joints[b]:
                dadr = jnt_dofadr[j]
                cdof_dot[dadr] = mx.motion_cross(vel, cdof[dadr])
                vel = vel + cdof[dadr] * v[dadr]
            cvel[b] = vel

        # ---- RNE (dynamics.py:19) ----
        cacc0 = jnp.concatenate([jnp.zeros(3, dtype),
                                 -jnp.asarray(gravity, dtype)])
        cacc = [cacc0] * nbody
        for b in order:
            a = cacc[parent[b]]
            for j in body_joints[b]:
                dadr = jnt_dofadr[j]
                a = a + cdof_dot[dadr] * v[dadr]
            cacc[b] = a
        cfrc = [mx.inert_mul(cinert[b], cacc[b])
                + mx.force_cross(cvel[b], mx.inert_mul(cinert[b], cvel[b]))
                for b in range(nbody)]
        for b in reversed(order):
            cfrc[parent[b]] = cfrc[parent[b]] + cfrc[b]
        qfrc_bias = [jnp.dot(cdof[i], cfrc[dof_body[i]])
                     for i in range(nv)]

        # ---- passive (dynamics.py:59) ----
        qfrc_passive = [-dof_damping[i] * v[i] for i in range(nv)]
        for j in range(njnt):
            if jnt_stiffness[j] != 0:
                qadr, dadr = jnt_qposadr[j], jnt_dofadr[j]
                qfrc_passive[dadr] = qfrc_passive[dadr] - \
                    jnt_stiffness[j] * (q[qadr] - qpos_spring[qadr])

        # ---- actuation (actuation.py:20,93) ----
        qfrc_act = [jnp.zeros((), dtype)] * nv
        for u in range(nu):
            c = ctrl[u]
            if act_ctrllim[u]:
                c = jnp.clip(c, act_ctrlrange[u][0], act_ctrlrange[u][1])
            force = act_gear0[u] * c
            if act_forcelim[u]:
                force = jnp.clip(force, act_forcerange[u][0],
                                 act_forcerange[u][1])
            dadr = jnt_dofadr[act_jid[u]]
            qfrc_act[dadr] = qfrc_act[dadr] + force
        qfrc_smooth = [qfrc_passive[i] - qfrc_bias[i] + qfrc_act[i]
                       for i in range(nv)]
        qacc_smooth = _chol_solve(M, qfrc_smooth, nv)
        ctx = (xpos, xmat, cdof, subtree_com)
        return M, qfrc_smooth, qacc_smooth, q, v, ctx

    # ---- constraint rows + Newton (constraints.py / solver.py) ----

    _dis = int(np.asarray(m.opt.disableflags))
    contact_pairs = _contact_pairs_static(m) or []
    if _dis & int(DisableBit.CONSTRAINT):
        contact_pairs = []
        limit_rows = []
    elif _dis & int(DisableBit.LIMIT):
        limit_rows = []
    impratio = float(np.asarray(m.opt.impratio))

    def _limit_row_list(q, v, dtype):
        """Unilateral limit rows as (Jmap, aref, D) — constraints.py:279."""
        rows = []
        for (qadr, dadr, sign, bound, margin, solref, solimp,
             invw) in limit_rows:
            pos = sign * (q[qadr] - bound) - margin
            vel = v[dadr] * sign
            k, b, imp = _kbi(solref, solimp, pos)
            aref = -b * vel - k * pos
            r_reg = jnp.maximum(_MINVAL, (1.0 - imp) / imp * invw)
            act = pos < 0
            D = jnp.where(act, 1.0 / r_reg, 0.0)
            rows.append(({dadr: sign}, aref, D))
        return rows

    def _contact_row_list(ctx, v, dtype):
        """Pyramidal contact rows (constraints.py:341 _contact_rows); the
        narrowphase reuses the general per-pair colliders verbatim."""
        xpos, xmat, cdof, subtree_com = ctx
        rows = []
        for cp in contact_pairs:
            g1, g2 = cp["g1"], cp["g2"]
            b1, b2 = geom_bodyid[g1], geom_bodyid[g2]

            def gpose(g, b):
                p = xpos[b] + xmat[b] @ jnp.asarray(geom_pos[g], dtype)
                if np.allclose(geom_quat[g], [1, 0, 0, 0]):
                    mat = xmat[b]
                else:
                    mat = xmat[b] @ mx.quat_to_mat(
                        jnp.asarray(geom_quat[g], dtype))
                return p, mat

            p1, m1 = gpose(g1, b1)
            p2, m2 = gpose(g2, b2)
            s1 = jnp.asarray(np.asarray(m.geom_size)[g1], dtype)
            s2 = jnp.asarray(np.asarray(m.geom_size)[g2], dtype)
            dist, cpos, frame = cp["fn"](p1, m1, s1, p2, m2, s2)

            chain1, chain2 = body_chain[b1], body_chain[b2]
            dofs = sorted(set(chain1) | set(chain2))
            solref, solimp = cp["solref"], cp["solimp"]
            inv = cp["invweight"]
            mu0 = float(cp["friction"][0])
            inv_pyr = (inv + mu0 * mu0 * inv) * 2.0 * mu0 * mu0 / impratio
            for r in range(cp["nrows"]):
                pr = cpos[r]
                jd = {}
                for i in dofs:
                    jp = None
                    if i in chain2:
                        com = subtree_com[body_rootid[b2]]
                        jp = cdof[i][3:] + jnp.cross(cdof[i][:3], pr - com)
                    if i in chain1:
                        com = subtree_com[body_rootid[b1]]
                        j1 = cdof[i][3:] + jnp.cross(cdof[i][:3], pr - com)
                        jp = (jp - j1) if jp is not None else -j1
                    jd[i] = jp
                fr = frame[r]
                jn = {i: jnp.dot(fr[0], jd[i]) for i in dofs}
                pos_eff = dist[r] - cp["includemargin"]
                k, b, imp = _kbi(solref, solimp, pos_eff)
                act = pos_eff < 0
                if cp["condim"] == 1:
                    aref = -b * sum(jn[i] * v[i] for i in dofs) - k * pos_eff
                    r_reg = jnp.maximum(_MINVAL, (1.0 - imp) / imp * inv)
                    rows.append((jn, aref, jnp.where(act, 1.0 / r_reg, 0.0)))
                    continue
                r_reg = jnp.maximum(_MINVAL, (1.0 - imp) / imp * inv_pyr)
                D = jnp.where(act, 1.0 / r_reg, 0.0)
                for fi in (0, 1):
                    mu = float(cp["friction"][fi])
                    jt = {i: jnp.dot(fr[fi + 1], jd[i]) for i in dofs}
                    for sign in (1.0, -1.0):
                        J = {i: jn[i] + sign * mu * jt[i] for i in dofs}
                        aref = (-b * sum(J[i] * v[i] for i in dofs)
                                - k * pos_eff)
                        rows.append((J, aref, D))
        return rows

    def constraint(M, qacc_smooth, warm, q, v, ctx, dtype):
        rows = _limit_row_list(q, v, dtype)
        rows.extend(_contact_row_list(ctx, v, dtype))
        nrows = len(rows)
        if nrows == 0:
            return qacc_smooth, [jnp.zeros((), dtype)] * nv
        Jmaps = [r[0] for r in rows]
        arefs = [r[1] for r in rows]
        Dv = [r[2] for r in rows]

        def jar_of(x):
            return [sum(Jmaps[r][i] * x[i] for i in Jmaps[r]) - arefs[r]
                    for r in range(nrows)]

        def cost_terms(jar):
            cost, dcost, hw = [], [], []
            for r in range(nrows):
                quad = jar[r] < 0
                cost.append(jnp.where(quad, 0.5 * Dv[r] * jar[r] * jar[r],
                                      0.0))
                dcost.append(jnp.where(quad, Dv[r] * jar[r], 0.0))
                hw.append(jnp.where(quad, Dv[r], 0.0))
            return cost, dcost, hw

        def total_cost(x):
            jar = jar_of(x)
            cost, _, _ = cost_terms(jar)
            quad = jnp.zeros((), dtype)
            for i in range(nv):
                for jdof in range(nv):
                    quad = quad + 0.5 * (x[i] - qacc_smooth[i]) * \
                        M[i][jdof] * (x[jdof] - qacc_smooth[jdof])
            return quad + sum(cost)

        c0 = total_cost(qacc_smooth)
        warm_l = [warm[i] for i in range(nv)]
        cw = total_cost(warm_l)
        use_warm = cw < c0
        x0 = [jnp.where(use_warm, warm_l[i], qacc_smooth[i])
              for i in range(nv)]
        cost0 = jnp.minimum(cw, c0)

        def cond(carry):
            x, cost, improvement, gnorm, it = carry
            return jnp.any((it < iterations)
                           & (improvement > tol * scale)
                           & (gnorm > tol * scale))

        def body(carry):
            x, cost, improvement, gnorm, it = carry
            live = ((it < iterations) & (improvement > tol * scale)
                    & (gnorm > tol * scale))
            jar = jar_of(x)
            _, dcost, hw = cost_terms(jar)
            grad = [None] * nv
            for i in range(nv):
                g = jnp.zeros((), dtype)
                for jdof in range(nv):
                    g = g + M[i][jdof] * (x[jdof] - qacc_smooth[jdof])
                grad[i] = g
            for r in range(nrows):
                for i, Ji in Jmaps[r].items():
                    grad[i] = grad[i] + Ji * dcost[r]
            H = [[M[i][jdof] for jdof in range(nv)] for i in range(nv)]
            for r in range(nrows):
                items = list(Jmaps[r].items())
                for a, (ia, Ja) in enumerate(items):
                    for ib, Jb in items[a:]:
                        term = hw[r] * Ja * Jb
                        H[ia][ib] = H[ia][ib] + term
                        if ia != ib:
                            H[ib][ia] = H[ib][ia] + term
            p = _chol_solve(H, [-g for g in grad], nv)

            jp = [sum(Jmaps[r][i] * p[i] for i in Jmaps[r])
                  for r in range(nrows)]
            mp = [None] * nv
            for i in range(nv):
                s = jnp.zeros((), dtype)
                for jdof in range(nv):
                    s = s + M[i][jdof] * p[jdof]
                mp[i] = s
            p_mp = sum(p[i] * mp[i] for i in range(nv))
            x_as = [x[i] - qacc_smooth[i] for i in range(nv)]

            def ls_body(k, alpha):
                jar_a = [jar[r] + alpha * jp[r] for r in range(nrows)]
                _, dcost_a, hw_a = cost_terms(jar_a)
                d1 = sum((x_as[i] + alpha * p[i]) * mp[i]
                         for i in range(nv))
                d1 = d1 + sum(dcost_a[r] * jp[r] for r in range(nrows))
                d2 = p_mp + sum(hw_a[r] * jp[r] * jp[r]
                                for r in range(nrows))
                # pin the carry dtype: baked np.float64 model constants
                # would otherwise promote f32 under jax_enable_x64
                return (alpha - d1 / jnp.maximum(d2, _MINVAL)).astype(dtype)

            alpha = jax.lax.fori_loop(0, ls_iterations, ls_body,
                                      jnp.asarray(1.0, dtype))
            alpha = jnp.clip(alpha, 0.0, 4.0)
            x_try = [x[i] + alpha * p[i] for i in range(nv)]
            cost_try = total_cost(x_try)
            better = (cost_try < cost) & live
            x_new = [jnp.where(better, x_try[i], x[i]).astype(dtype)
                     for i in range(nv)]
            cost_new = jnp.where(better, cost_try, cost).astype(dtype)
            improvement_new = jnp.where(live, cost - cost_new,
                                        improvement).astype(dtype)
            g2 = sum(g * g for g in grad)
            gnorm_new = jnp.where(live, jnp.sqrt(g2), gnorm).astype(dtype)
            return (tuple(x_new), cost_new, improvement_new, gnorm_new,
                    it + 1)

        init = (tuple(jnp.asarray(xi, dtype) for xi in x0),
                jnp.asarray(cost0, dtype), jnp.asarray(jnp.inf, dtype),
                jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32))
        x, _, _, _, _ = jax.lax.while_loop(cond, body, init)
        x = list(x)
        jar = jar_of(x)
        _, dcost, _ = cost_terms(jar)
        qfrc_con = [jnp.zeros((), dtype)] * nv
        for r in range(nrows):
            for i, Ji in Jmaps[r].items():
                qfrc_con[i] = qfrc_con[i] - Ji * dcost[r]
        return x, qfrc_con

    has_damping = bool(np.any(dof_damping))

    def forward(qpos, qvel, warm, ctrl):
        """qacc + (qfrc_smooth + qfrc_constraint) for one state."""
        M, qfrc_smooth, qacc_smooth, q, v, ctx = smooth(qpos, qvel, ctrl)
        qacc, qfrc_con = constraint(M, qacc_smooth, warm, q, v, ctx,
                                    qpos.dtype)
        return M, qacc, qfrc_smooth, qfrc_con

    def euler_advance(M, qacc, qfrc_smooth, qfrc_con, qpos, qvel):
        dtype = qpos.dtype
        if has_damping:
            Mh = [[M[i][jdof] + (dt * dof_damping[i] if i == jdof else 0.0)
                   for jdof in range(nv)] for i in range(nv)]
            rhs = [qfrc_smooth[i] + qfrc_con[i] for i in range(nv)]
            qacc = _chol_solve(Mh, rhs, nv)
        qvel_n = jnp.stack([qvel[i] + dt * qacc[i] for i in range(nv)])
        qpos_n = qpos + dt * qvel_n
        return qpos_n, qvel_n

    _RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
    _RK4_B = (1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6)

    def step1(qpos, qvel, warm, ctrl):
        """One physics step; mirrors engine.step for this model class."""
        M, qacc, qfs, qfc = forward(qpos, qvel, warm, ctrl)
        warm_new = jnp.stack(qacc)
        if integ == int(IntegratorType.EULER):
            qpos_n, qvel_n = euler_advance(M, qacc, qfs, qfc, qpos, qvel)
            return qpos_n, qvel_n, warm_new
        # RK4 (engine.py:162)
        qvels = [qvel]
        qaccs = [jnp.stack(qacc)]
        for i in range(3):
            arow = _RK4_A[i]
            dqvel = sum(a * qa for a, qa in zip(arow, qaccs) if a)
            vel_i = qvel + dt * dqvel
            dvel_pos = sum(a * qv for a, qv in zip(arow, qvels) if a)
            qpos_i = qpos + dt * dvel_pos
            _, qacc_i, _, _ = forward(qpos_i, vel_i, warm_new, ctrl)
            qvels.append(vel_i)
            qaccs.append(jnp.stack(qacc_i))
        dvel = sum(b * qv for b, qv in zip(_RK4_B, qvels))
        dacc = sum(b * qa for b, qa in zip(_RK4_B, qaccs))
        qpos_n = qpos + dt * dvel
        qvel_n = qvel + dt * dacc
        return qpos_n, qvel_n, warm_new

    step1.fk_fields = fk_fields
    # fused observation FK is only equivalent to _observe's
    # fwd_position+sensor pipeline when the model has no sensors
    step1.fk_observe_ok = (m.nsensor == 0)
    return step1


# ---------------------------------------------------------------------------
# Hybrid fused-smooth step: SSA smooth dynamics + batched constraint solver.
# ---------------------------------------------------------------------------

_MAX_SMOOTH_NV = 36
_MAX_SMOOTH_ROWS = 420


def applicable_smooth(m: Model) -> bool:
    """True when ``build_smooth_step`` reproduces engine.step.

    Covers the free/ball-rooted mid-size tier (humanoid: nv=27, 177
    contact candidates) that the full-SSA path can't: the smooth stages
    (FK, com, CRB, com_vel, RNE, passive, actuation, narrowphase) run as
    one straight-line program per env — they are latency/kernel-count
    bound in array form — while constraint assembly and the projected
    Newton solver keep the batched array path, whose Hessian products
    are MXU-shaped FLOPs that scalarization would push off the MXU.
    """
    try:
        if m.njnt == 0 or m.na != 0 or m.ntendon != 0:
            return False
        if getattr(m, "neq", 0) != 0 or m.nv > _MAX_SMOOTH_NV:
            return False
        ok_types = {int(JointType.HINGE), int(JointType.SLIDE),
                    int(JointType.BALL), int(JointType.FREE)}
        jt = [int(t) for t in np.asarray(m.jnt_type)]
        if any(t not in ok_types for t in jt):
            return False
        # quaternion-joint restrictions: no springs, no limits (the SSA
        # passive/limit stages only model scalar joints)
        stiff = np.asarray(m.jnt_stiffness)
        limited = np.asarray(m.jnt_limited)
        for j, t in enumerate(jt):
            if t in (int(JointType.BALL), int(JointType.FREE)):
                if stiff[j] != 0 or int(limited[j]):
                    return False
        if np.any(np.asarray(m.dof_frictionloss) != 0):
            return False
        if int(np.asarray(m.opt.integrator)) != int(IntegratorType.EULER):
            return False
        if int(np.asarray(m.opt.cone)) == 1:  # elliptic: solver path differs
            return False
        if int(getattr(m.opt, "noslip_iterations", 0) or 0) != 0:
            return False
        from dm_control_tpu.physics import collision

        for key, nrows, pairs in collision.contact_groups(m):
            fn, _ = collision._resolve_collider(m, key)
            if isinstance(fn, tuple):  # hfield colliders need model data
                return False
        from dm_control_tpu.physics.collision import contact_rows_static

        dims, _, _ = contact_rows_static(m)
        rows = sum(1 if c == 1 else 2 * (c - 1) for c in dims)
        if rows + 2 * m.njnt > _MAX_SMOOTH_ROWS:
            return False
        for u in range(m.nu):
            if int(m.actuator_trntype[u]) not in (
                    int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
                return False
            # the SSA actuation applies gear[0]*ctrl to ONE dof; a motor
            # on a ball/free joint takes the 3-vector gear transmission
            # (actuation.py:57) that this path doesn't model
            if jt[int(m.actuator_trnid[u][0])] not in (
                    int(JointType.HINGE), int(JointType.SLIDE)):
                return False
            if int(m.actuator_dyntype[u]) != int(DynType.NONE):
                return False
            if int(np.asarray(m.actuator_gaintype)[u]) != int(
                    GainType.FIXED):
                return False
            if int(np.asarray(m.actuator_biastype)[u]) != int(
                    BiasType.NONE):
                return False
        harmless = (int(DisableBit.CONTACT) | int(DisableBit.FILTERPARENT)
                    | int(DisableBit.FRICTIONLOSS))
        if int(np.asarray(m.opt.disableflags)) & ~harmless:
            return False
        if float(np.asarray(m.opt.density)) != 0.0 or \
                float(np.asarray(m.opt.viscosity)) != 0.0:
            return False
        if np.any(np.asarray(m.opt.wind) != 0.0):
            return False
        return True
    except Exception:
        return False


def build_smooth_step(m: Model):
    """step1(qpos, qvel, warm, ctrl) -> (qpos', qvel', warm') mirroring
    engine.step for ``applicable_smooth`` models.

    The smooth half mirrors kinematics.py / inertia.py / dynamics.py /
    actuation.py / collision.py per-value (free/ball quaternion joints
    included); its outputs are stacked into the standard Data fields and
    handed to the UNCHANGED batched constraints.make_constraint /
    solver.solve / engine.euler — so the solver semantics (and its
    oracle parity) are shared, not duplicated.
    """
    if not applicable_smooth(m):
        return None
    import jax  # noqa: F811 (module-level import is shadowed in closures)

    from dm_control_tpu.physics import collision as coll
    from dm_control_tpu.physics import constraints as cons
    from dm_control_tpu.physics import engine as eng
    from dm_control_tpu.physics import solver as slv
    from dm_control_tpu.physics.model import make_data

    nbody, njnt, nv, nu, nq = (m.nbody, m.njnt, int(m.nv), int(m.nu),
                               int(m.nq))
    parent = [int(b) for b in np.asarray(m.body_parentid)]
    body_pos = np.asarray(m.body_pos, np.float64)
    body_quat = np.asarray(m.body_quat, np.float64)
    body_mass = np.asarray(m.body_mass, np.float64)
    body_inertia = np.asarray(m.body_inertia, np.float64)
    body_ipos = np.asarray(m.body_ipos, np.float64)
    body_iquat = np.asarray(m.body_iquat, np.float64)
    body_rootid = [int(b) for b in np.asarray(m.body_rootid)]
    subtreemass = np.asarray(m.body_subtreemass, np.float64)
    jnt_bodyid = [int(j) for j in np.asarray(m.jnt_bodyid)]
    jnt_type = [int(t) for t in np.asarray(m.jnt_type)]
    jnt_axis = np.asarray(m.jnt_axis, np.float64)
    jnt_pos = np.asarray(m.jnt_pos, np.float64)
    jnt_qposadr = [int(a) for a in np.asarray(m.jnt_qposadr)]
    jnt_dofadr = [int(a) for a in np.asarray(m.jnt_dofadr)]
    qpos0 = np.asarray(m.qpos0, np.float64)
    qpos_spring = np.asarray(m.qpos_spring, np.float64)
    jnt_stiffness = np.asarray(m.jnt_stiffness, np.float64)
    dof_damping = np.asarray(m.dof_damping, np.float64)
    dof_armature = np.asarray(m.dof_armature, np.float64)
    gravity = np.asarray(m.opt.gravity, np.float64)

    def jnt_ndof(t):
        return {int(JointType.FREE): 6, int(JointType.BALL): 3}.get(t, 1)

    body_joints = [[] for _ in range(nbody)]
    for j in range(njnt):
        body_joints[jnt_bodyid[j]].append(j)

    def chain(b):
        out = []
        while b != 0:
            for j in body_joints[b]:
                out.extend(range(jnt_dofadr[j],
                                 jnt_dofadr[j] + jnt_ndof(jnt_type[j])))
            b = parent[b]
        return sorted(out)

    body_chain = [chain(b) for b in range(nbody)]
    dof_body = [0] * nv
    for j in range(njnt):
        for k in range(jnt_ndof(jnt_type[j])):
            dof_body[jnt_dofadr[j] + k] = jnt_bodyid[j]
    order = list(range(1, nbody))

    act_jid = [int(m.actuator_trnid[u][0]) for u in range(nu)]
    act_gear0 = np.asarray(m.actuator_gear, np.float64)[:, 0] if nu else []
    act_ctrllim = [bool(l) for l in np.asarray(m.actuator_ctrllimited)] \
        if nu else []
    act_ctrlrange = np.asarray(m.actuator_ctrlrange, np.float64) if nu \
        else []
    act_forcelim = [bool(l) for l in np.asarray(m.actuator_forcelimited)] \
        if nu else []
    act_forcerange = np.asarray(m.actuator_forcerange, np.float64) if nu \
        else []

    def fk(qpos):
        """kinematics.py:50 per-body, incl. FREE/BALL quaternion joints."""
        dtype = qpos.dtype
        xpos = [jnp.zeros(3, dtype)] * nbody
        xquat = [None] * nbody
        xquat[0] = jnp.array([1.0, 0, 0, 0], dtype)
        xanchor = [None] * njnt
        xaxis = [None] * njnt
        for b in order:
            p = parent[b]
            pq = xquat[p]
            pos = xpos[p] + mx.rotate(jnp.asarray(body_pos[b], dtype), pq)
            quat = pq if np.allclose(body_quat[b], [1, 0, 0, 0]) else \
                mx.quat_mul(pq, jnp.asarray(body_quat[b], dtype))
            for j in body_joints[b]:
                qadr = jnt_qposadr[j]
                jp = jnp.asarray(jnt_pos[j], dtype)
                ja = jnp.asarray(jnt_axis[j], dtype)
                t = jnt_type[j]
                if t == int(JointType.FREE):
                    pos = qpos[qadr:qadr + 3]
                    quat = mx.quat_normalize(qpos[qadr + 3:qadr + 7])
                    xanchor[j] = pos
                    xaxis[j] = mx.rotate(ja, quat)
                elif t == int(JointType.BALL):
                    anchor = pos + mx.rotate(jp, quat)
                    qloc = mx.quat_normalize(qpos[qadr:qadr + 4])
                    quat = mx.quat_mul(quat, qloc)
                    pos = anchor - mx.rotate(jp, quat)
                    xanchor[j] = anchor
                    xaxis[j] = mx.rotate(ja, quat)
                elif t == int(JointType.SLIDE):
                    axis_w = mx.rotate(ja, quat)
                    pos = pos + axis_w * (qpos[qadr] - qpos0[qadr])
                    xanchor[j] = pos + mx.rotate(jp, quat)
                    xaxis[j] = axis_w
                else:  # HINGE
                    anchor = pos + mx.rotate(jp, quat)
                    angle = qpos[qadr] - qpos0[qadr]
                    quat = mx.quat_mul(
                        quat, mx.axis_angle_to_quat(ja, angle))
                    pos = anchor - mx.rotate(jp, quat)
                    xanchor[j] = anchor
                    xaxis[j] = mx.rotate(ja, quat)
            xpos[b] = pos
            xquat[b] = quat
        return xpos, xquat, xanchor, xaxis

    geom_bodyid = [int(b) for b in np.asarray(m.geom_bodyid)] \
        if m.ngeom else []
    geom_pos = np.asarray(m.geom_pos, np.float64) if m.ngeom else None
    geom_quat = np.asarray(m.geom_quat, np.float64) if m.ngeom else None
    geom_size = np.asarray(m.geom_size, np.float64) if m.ngeom else None

    # static narrowphase structure (order MUST match collision.collision:
    # groups -> pairs -> nrows so the Contact row layout is identical)
    _groups = []
    _incs, _fris, _srs, _sis = [], [], [], []
    for key, nrows, pairs in coll.contact_groups(m):
        fn, _ = coll._resolve_collider(m, key)
        _groups.append((fn, nrows, [(int(p[0]), int(p[1])) for p in pairs]))
        fr5, sr, si, inc = coll._pair_params_arrays(m, pairs)
        rep = lambda x: np.repeat(np.asarray(x, np.float32), nrows, axis=0)
        _fris.append(rep(fr5))
        _srs.append(rep(sr))
        _sis.append(rep(si))
        _incs.append(rep(inc))

    template = make_data(m, jnp.float32)
    if _groups:
        # bake the per-candidate mixed contact params (the general path
        # recomputes these each step in collision(); they are static)
        template = template.replace(contact=template.contact.replace(
            friction=jnp.asarray(np.concatenate(_fris)),
            solref=jnp.asarray(np.concatenate(_srs)),
            solimp=jnp.asarray(np.concatenate(_sis)),
            includemargin=jnp.asarray(np.concatenate(_incs))))

    def smooth_fields(qpos, qvel, ctrl):
        """All Data fields fwd_position+fwd_velocity+fwd_actuation+
        fwd_acceleration would set, as one straight-line program."""
        dtype = qpos.dtype
        v = [qvel[i] for i in range(nv)]

        xpos, xquat, xanchor, xaxis = fk(qpos)
        xmat = [mx.quat_to_mat(xquat[b]) for b in range(nbody)]
        xipos = [None] * nbody
        ximat = [None] * nbody
        for b in range(nbody):
            xipos[b] = xpos[b] + xmat[b] @ jnp.asarray(body_ipos[b], dtype)
            ximat[b] = (xmat[b]
                        if np.allclose(body_iquat[b], [1, 0, 0, 0])
                        else xmat[b] @ mx.quat_to_mat(
                            jnp.asarray(body_iquat[b], dtype)))

        # ---- com_pos (kinematics.py:138) ----
        acc = [body_mass[b] * xipos[b] for b in range(nbody)]
        for b in reversed(order):
            acc[parent[b]] = acc[parent[b]] + acc[b]
        subtree_com = [acc[b] / max(subtreemass[b], _MINVAL)
                       for b in range(nbody)]
        cinert = [None] * nbody
        for b in range(nbody):
            offset = xipos[b] - subtree_com[body_rootid[b]]
            cinert[b] = mx.inert_from_body(
                jnp.asarray(body_mass[b], dtype),
                jnp.asarray(body_inertia[b], dtype), offset, ximat[b])
        cdof = [None] * nv
        for j in range(njnt):
            dadr = jnt_dofadr[j]
            b = jnt_bodyid[j]
            com = subtree_com[body_rootid[b]]
            t = jnt_type[j]
            if t == int(JointType.FREE):
                for k in range(3):
                    cdof[dadr + k] = jnp.zeros(6, dtype).at[3 + k].set(1.0)
                for k in range(3):
                    ax = xmat[b][:, k]
                    cdof[dadr + 3 + k] = jnp.concatenate(
                        [ax, jnp.cross(ax, com - xanchor[j])])
            elif t == int(JointType.BALL):
                for k in range(3):
                    ax = xmat[b][:, k]
                    cdof[dadr + k] = jnp.concatenate(
                        [ax, jnp.cross(ax, com - xanchor[j])])
            elif t == int(JointType.SLIDE):
                cdof[dadr] = jnp.concatenate(
                    [jnp.zeros(3, dtype), xaxis[j]])
            else:
                cdof[dadr] = jnp.concatenate(
                    [xaxis[j], jnp.cross(xaxis[j],
                                         subtree_com[body_rootid[b]]
                                         - xanchor[j])])

        # ---- CRB (inertia.py:19) ----
        crb_i = list(cinert)
        for b in reversed(order):
            crb_i[parent[b]] = crb_i[parent[b]] + crb_i[b]
        M = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            f_i = mx.inert_mul(crb_i[dof_body[i]], cdof[i])
            for jdof in body_chain[dof_body[i]]:
                if jdof <= i:
                    M[i][jdof] = jnp.dot(f_i, cdof[jdof])
                    M[jdof][i] = M[i][jdof]
        zero = jnp.zeros((), dtype)
        for i in range(nv):
            M[i][i] = M[i][i] + dof_armature[i]
            for jdof in range(nv):
                if M[i][jdof] is None:
                    M[i][jdof] = zero

        # ---- com_vel (kinematics.py:196, incl. free two-phase) ----
        cvel = [jnp.zeros(6, dtype)] * nbody
        cdof_dot = [None] * nv
        for b in order:
            vel = cvel[parent[b]]
            for j in body_joints[b]:
                dadr = jnt_dofadr[j]
                t = jnt_type[j]
                if t == int(JointType.FREE):
                    for k in range(3):
                        cdof_dot[dadr + k] = jnp.zeros(6, dtype)
                        vel = vel + cdof[dadr + k] * v[dadr + k]
                    for k in range(3, 6):
                        cdof_dot[dadr + k] = mx.motion_cross(
                            vel, cdof[dadr + k])
                    for k in range(3, 6):
                        vel = vel + cdof[dadr + k] * v[dadr + k]
                elif t == int(JointType.BALL):
                    for k in range(3):
                        cdof_dot[dadr + k] = mx.motion_cross(
                            vel, cdof[dadr + k])
                    for k in range(3):
                        vel = vel + cdof[dadr + k] * v[dadr + k]
                else:
                    cdof_dot[dadr] = mx.motion_cross(vel, cdof[dadr])
                    vel = vel + cdof[dadr] * v[dadr]
            cvel[b] = vel

        # ---- RNE (dynamics.py:19) ----
        cacc0 = jnp.concatenate([jnp.zeros(3, dtype),
                                 -jnp.asarray(gravity, dtype)])
        cacc = [cacc0] * nbody
        for b in order:
            a = cacc[parent[b]]
            for j in body_joints[b]:
                dadr = jnt_dofadr[j]
                for k in range(jnt_ndof(jnt_type[j])):
                    a = a + cdof_dot[dadr + k] * v[dadr + k]
            cacc[b] = a
        cfrc = [mx.inert_mul(cinert[b], cacc[b])
                + mx.force_cross(cvel[b], mx.inert_mul(cinert[b], cvel[b]))
                for b in range(nbody)]
        for b in reversed(order):
            cfrc[parent[b]] = cfrc[parent[b]] + cfrc[b]
        qfrc_bias = [jnp.dot(cdof[i], cfrc[dof_body[i]])
                     for i in range(nv)]

        # ---- passive (dynamics.py:59; scalar joints only by gate) ----
        qfrc_passive = [-dof_damping[i] * v[i] for i in range(nv)]
        for j in range(njnt):
            if jnt_stiffness[j] != 0:
                qadr, dadr = jnt_qposadr[j], jnt_dofadr[j]
                qfrc_passive[dadr] = qfrc_passive[dadr] - \
                    jnt_stiffness[j] * (qpos[qadr] - qpos_spring[qadr])

        # ---- actuation (actuation.py) ----
        qfrc_act = [zero] * nv
        actuator_force = []
        for u in range(nu):
            c = ctrl[u]
            if act_ctrllim[u]:
                c = jnp.clip(c, act_ctrlrange[u][0], act_ctrlrange[u][1])
            force = act_gear0[u] * c
            if act_forcelim[u]:
                force = jnp.clip(force, act_forcerange[u][0],
                                 act_forcerange[u][1])
            actuator_force.append(force)
            dadr = jnt_dofadr[act_jid[u]]
            qfrc_act[dadr] = qfrc_act[dadr] + force
        qfrc_smooth = [qfrc_passive[i] - qfrc_bias[i] + qfrc_act[i]
                       for i in range(nv)]
        qacc_smooth = _chol_solve(M, qfrc_smooth, nv)

        # ---- narrowphase (collision.py:712, same candidate order) ----
        dists, poss, frames = [], [], []
        gxp = [None] * m.ngeom
        gxm = [None] * m.ngeom
        for g in range(m.ngeom):
            b = geom_bodyid[g]
            gxp[g] = xpos[b] + xmat[b] @ jnp.asarray(geom_pos[g], dtype)
            gxm[g] = (xmat[b]
                      if np.allclose(geom_quat[g], [1, 0, 0, 0])
                      else xmat[b] @ mx.quat_to_mat(
                          jnp.asarray(geom_quat[g], dtype)))
        for fn, nrows, pairs in _groups:
            for g1, g2 in pairs:
                s1 = jnp.asarray(geom_size[g1], dtype)
                s2 = jnp.asarray(geom_size[g2], dtype)
                dist, cpos, frame = fn(gxp[g1], gxm[g1], s1,
                                       gxp[g2], gxm[g2], s2)
                dists.append(jnp.atleast_1d(dist).reshape(-1))
                poss.append(cpos.reshape(-1, 3))
                frames.append(frame.reshape(-1, 3, 3))

        fields = dict(
            xpos=jnp.stack(xpos), xquat=jnp.stack(xquat),
            xmat=jnp.stack(xmat), xipos=jnp.stack(xipos),
            ximat=jnp.stack(ximat),
            jnt_xanchor=jnp.stack(xanchor), jnt_xaxis=jnp.stack(xaxis),
            geom_xpos=jnp.stack(gxp) if m.ngeom else template.geom_xpos,
            geom_xmat=jnp.stack(gxm) if m.ngeom else template.geom_xmat,
            subtree_com=jnp.stack(subtree_com),
            cinert=jnp.stack(cinert),
            cdof=jnp.stack(cdof),
            cdof_dot=jnp.stack(cdof_dot),
            cvel=jnp.stack(cvel),
            qM=jnp.stack([jnp.stack(row) for row in M]),
            qfrc_bias=jnp.stack(qfrc_bias),
            qfrc_passive=jnp.stack(qfrc_passive),
            qfrc_actuator=(jnp.stack(qfrc_act)),
            actuator_force=(jnp.stack(actuator_force)
                            if nu else template.actuator_force),
            qfrc_smooth=jnp.stack(qfrc_smooth),
            qacc_smooth=jnp.stack(qacc_smooth),
        )
        if dists:
            fields["contact"] = template.contact.replace(
                dist=jnp.concatenate(dists),
                pos=jnp.concatenate(poss),
                frame=jnp.concatenate(frames))
        return fields

    def step1(qpos, qvel, warm, ctrl):
        dtype = qpos.dtype
        fields = smooth_fields(qpos, qvel, ctrl)
        fields = {k: (jnp.asarray(val, dtype)
                      if hasattr(val, "astype") else val)
                  for k, val in fields.items()}
        d = template.replace(
            qpos=qpos, qvel=qvel, ctrl=ctrl, qacc_warmstart=warm,
            **fields)
        d = d.replace(qLD=d.qM)  # factor placeholder (inertia.factor_m)
        d = eng.fwd_constraint(m, d)
        warm_new = d.qacc
        d = eng.euler(m, d)
        return (jnp.asarray(d.qpos, dtype), jnp.asarray(d.qvel, dtype),
                jnp.asarray(warm_new, dtype))

    step1.fk_observe_ok = False  # observation uses the general pipeline
    return step1
