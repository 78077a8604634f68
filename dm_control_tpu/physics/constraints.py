"""Soft-constraint row assembly (mj_makeConstraint analogue).

Builds the efc system for the solver: equality constraints, dof friction
loss, joint/tendon limits, and contact rows (pyramidal friction cones).
Row structure (kinds, counts) is static per model; activity is decided by
the solver from jar = J qacc - aref, so inactive rows are carried at zero
cost instead of changing array shapes.

MuJoCo's soft-constraint model: each row has impedance d(pos) from solimp,
reference acceleration aref from solref, and regularization
R = (1 - d)/d * diagApprox, D = 1/R.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import kinematics as kin
from dm_control_tpu.physics.model import (
    Data, DisableBit, EqType, JointType, Model, static_field,
    pytree_dataclass,
)

_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999

# Row kinds (static).
EQUALITY = 0
FRICTIONLOSS = 1
LIMIT = 2  # unilateral: limits and contact rows


@pytree_dataclass
class Efc:
    """The assembled constraint system."""

    J: jax.Array  # (nefc, nv)
    D: jax.Array  # (nefc,)
    R: jax.Array  # (nefc,)
    aref: jax.Array  # (nefc,)
    pos: jax.Array  # (nefc,) effective violation (dist - margin)
    floss: jax.Array  # (nefc,) friction loss bound (frictionloss rows)
    kind: Tuple[int, ...] = static_field(default=())
    # (contact_index, first_row, n_rows) per contact, for force recovery
    contact_spans: Tuple[Tuple[int, int, int], ...] = static_field(default=())

    @property
    def nefc(self) -> int:
        return len(self.kind)


def impedance(solimp, pos):
    """Constraint impedance d(pos) per the solimp spline."""
    dmin, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                     solimp[..., 2], solimp[..., 3],
                                     solimp[..., 4])
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    mid = jnp.clip(mid, _MINIMP, _MAXIMP)
    power = jnp.maximum(power, 1.0)
    y_lo = (x / mid) ** power * mid
    y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def kbi(m: Model, solref, solimp, pos):
    """Stiffness/damping/impedance from solref/solimp (mj docs 'Solver
    parameters'): k = d / (dmax^2 tau^2 zeta^2), b = 2 / (dmax tau)."""
    imp = impedance(solimp, pos)
    dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    if not (m.opt.disableflags & DisableBit.REFSAFE):
        timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)
    k_std = imp / jnp.maximum((dmax * timeconst * dampratio) ** 2, _MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    # direct (non-positive solref): stiffness/damping given literally
    k_dir = -solref[..., 0] * imp  # scaled by impedance
    b_dir = -solref[..., 1]
    direct = solref[..., 0] <= 0
    k = jnp.where(direct, k_dir, k_std)
    b = jnp.where(direct, b_dir, b_std)
    return k, b, imp


def _row(m, J, pos, solref, solimp, diag_approx, kind, vel, floss=0.0,
         active=True):
    """One efc row.  ``active`` replicates MuJoCo's *inclusion* rule (rows
    are only instantiated when violated/within margin): inactive rows stay
    in the static arrays with D = 0, contributing nothing to the solver."""
    k, b, imp = kbi(m, solref, solimp, pos)
    aref = -b * vel - k * pos
    r = jnp.maximum(_MINVAL, (1.0 - imp) / imp * diag_approx)
    dvec = 1.0 / r
    if active is not True:
        dvec = jnp.where(active, dvec, 0.0)
    return dict(J=J, D=dvec, R=r, aref=aref, pos=pos, kind=kind,
                floss=jnp.asarray(floss, J.dtype))


def make_constraint(m: Model, d: Data) -> Efc:
    dtype = d.qpos.dtype
    rows = []
    dis = m.opt.disableflags
    if not (dis & DisableBit.CONSTRAINT):
        if not (dis & DisableBit.EQUALITY):
            rows += _equality_rows(m, d)
        if not (dis & DisableBit.FRICTIONLOSS):
            rows += _frictionloss_rows(m, d)
        if not (dis & DisableBit.LIMIT):
            rows += _limit_rows(m, d)
    contact_spans = []
    if not (dis & DisableBit.CONSTRAINT) and not (dis & DisableBit.CONTACT):
        crows, contact_spans = _contact_rows(m, d, offset=len(rows))
        rows += crows

    if not rows:
        z = jnp.zeros((0,), dtype)
        return Efc(J=jnp.zeros((0, m.nv), dtype), D=z, R=z, aref=z, pos=z,
                   floss=z, kind=(), contact_spans=())

    return Efc(
        J=jnp.stack([r["J"] for r in rows]),
        D=jnp.stack([r["D"] for r in rows]),
        R=jnp.stack([r["R"] for r in rows]),
        aref=jnp.stack([r["aref"] for r in rows]),
        pos=jnp.stack([r["pos"] for r in rows]),
        floss=jnp.stack([r["floss"] for r in rows]),
        kind=tuple(r["kind"] for r in rows),
        contact_spans=tuple(contact_spans),
    )


def _equality_rows(m: Model, d: Data):
    rows = []
    for e in range(m.neq):
        etype = EqType(m.eq_type[e])
        solref, solimp = m.eq_solref[e], m.eq_solimp[e]
        if etype == EqType.CONNECT:
            b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
            anchor = m.eq_data[e, :3]
            p1 = d.xpos[b1] + d.xmat[b1] @ anchor
            # anchor expressed in body2's frame at model config: MuJoCo
            # stores the body2-local anchor in data[3:6] (computed by the
            # compiler); our compiler leaves it to runtime:
            p2_local = m.eq_data[e, 3:6]
            p2 = d.xpos[b2] + d.xmat[b2] @ p2_local
            jac1p, _ = kin.jac(m, d, p1, b1)
            jac2p, _ = kin.jac(m, d, p2, b2)
            jdiff = jac1p - jac2p
            pos3 = p1 - p2
            vel3 = jdiff @ d.qvel
            inv = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
            # impedance uses the norm of the 3D violation
            posnorm = jnp.linalg.norm(pos3)
            for k in range(3):
                rows.append(_row(m, jdiff[k], pos3[k], solref, solimp,
                                 inv, EQUALITY, vel3[k]))
                # note: MuJoCo uses per-row pos for aref but norm-based
                # impedance; we approximate with per-row pos (close for
                # small violations)
        elif etype == EqType.JOINT:
            j1 = m.eq_obj1id[e]
            j2 = m.eq_obj2id[e]
            poly = m.eq_data[e, :5]
            a1, d1 = m.jnt_qposadr[j1], m.jnt_dofadr[j1]
            q1 = d.qpos[a1] - m.qpos0[a1]
            J = jnp.zeros(m.nv, d.qpos.dtype).at[d1].set(1.0)
            if j2 >= 0:
                a2, d2adr = m.jnt_qposadr[j2], m.jnt_dofadr[j2]
                q2 = d.qpos[a2] - m.qpos0[a2]
                dpoly = (poly[1] + 2 * poly[2] * q2 + 3 * poly[3] * q2 ** 2
                         + 4 * poly[4] * q2 ** 3)
                val = (poly[0] + poly[1] * q2 + poly[2] * q2 ** 2
                       + poly[3] * q2 ** 3 + poly[4] * q2 ** 4)
                J = J.at[d2adr].set(-dpoly)
                pos = q1 - val
                inv = (m.dof_invweight0[d1] + m.dof_invweight0[d2adr])
            else:
                pos = q1 - poly[0]
                inv = m.dof_invweight0[d1]
            vel = J @ d.qvel
            rows.append(_row(m, J, pos, solref, solimp, inv, EQUALITY, vel))
        elif etype == EqType.TENDON:
            t1 = m.eq_obj1id[e]
            t2 = m.eq_obj2id[e]
            poly = m.eq_data[e, :5]
            l1 = d.ten_length[t1] - m.tendon_length0[t1]
            J = d.ten_moment[t1]
            if t2 >= 0:
                l2 = d.ten_length[t2] - m.tendon_length0[t2]
                dpoly = (poly[1] + 2 * poly[2] * l2 + 3 * poly[3] * l2 ** 2
                         + 4 * poly[4] * l2 ** 3)
                val = (poly[0] + poly[1] * l2 + poly[2] * l2 ** 2
                       + poly[3] * l2 ** 3 + poly[4] * l2 ** 4)
                J = J - dpoly * d.ten_moment[t2]
                pos = l1 - val
                inv = m.tendon_invweight0[t1] + m.tendon_invweight0[t2]
            else:
                pos = l1 - poly[0]
                inv = m.tendon_invweight0[t1]
            vel = J @ d.qvel
            rows.append(_row(m, J, pos, solref, solimp, inv, EQUALITY, vel))
        elif etype == EqType.WELD:
            b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
            anchor = m.eq_data[e, :3]
            relpose = m.eq_data[e, 3:10]
            torquescale = m.eq_data[e, 10]
            p1 = d.xpos[b1] + d.xmat[b1] @ anchor
            p2 = d.xpos[b2] + d.xmat[b2] @ anchor  # simplified
            jac1p, jac1r = kin.jac(m, d, p1, b1)
            jac2p, jac2r = kin.jac(m, d, p2, b2)
            jdiffp = jac1p - jac2p
            jdiffr = (jac1r - jac2r) * torquescale
            pos3 = p1 - p2
            from dm_control_tpu.physics import mathx as mx

            q1 = d.xquat[b1]
            q2 = mx.quat_mul(d.xquat[b2], relpose[3:7])
            rot3 = mx.quat_sub(q1, q2) * torquescale
            inv_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            inv_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
            velp = jdiffp @ d.qvel
            velr = jdiffr @ d.qvel
            for k in range(3):
                rows.append(_row(m, jdiffp[k], pos3[k], solref, solimp,
                                 inv_t, EQUALITY, velp[k]))
            for k in range(3):
                rows.append(_row(m, jdiffr[k], rot3[k], solref, solimp,
                                 inv_r, EQUALITY, velr[k]))
        else:
            raise NotImplementedError(f"equality {etype}")
    return rows


def _frictionloss_rows(m: Model, d: Data):
    rows = []
    import numpy as np

    floss = np.asarray(m.dof_frictionloss)
    for v in range(m.nv):
        if floss[v] <= 0:
            continue
        J = jnp.zeros(m.nv, d.qpos.dtype).at[v].set(1.0)
        zero = jnp.zeros((), d.qpos.dtype)
        r = _row(m, J, zero, m.dof_solref[v], m.dof_solimp[v],
                 m.dof_invweight0[v], FRICTIONLOSS, d.qvel[v],
                 floss=m.dof_frictionloss[v])
        rows.append(r)
    return rows


def _limit_rows(m: Model, d: Data):
    rows = []
    for j in range(m.njnt):
        if not m.jnt_limited[j]:
            continue
        jtype = JointType(m.jnt_type[j])
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        margin = m.jnt_margin[j]
        if jtype in (JointType.HINGE, JointType.SLIDE):
            q = d.qpos[qadr]
            for side, sign in ((0, 1.0), (1, -1.0)):
                dist = sign * (q - m.jnt_range[j, side])
                J = jnp.zeros(m.nv, d.qpos.dtype).at[dadr].set(sign)
                pos = dist - margin
                vel = sign * d.qvel[dadr]
                rows.append(_row(m, J, pos, m.jnt_solref[j], m.jnt_solimp[j],
                                 m.dof_invweight0[dadr], LIMIT, vel,
                                 active=pos < 0))
        elif jtype == JointType.BALL:
            # limit on total rotation angle (axis-angle norm)
            from dm_control_tpu.physics import mathx as mx

            rotvec = mx.quat_to_axis_angle(d.qpos[qadr:qadr + 4])
            angle = jnp.linalg.norm(rotvec)
            axis = rotvec / jnp.maximum(angle, _MINVAL)
            maxang = jnp.maximum(m.jnt_range[j, 0], m.jnt_range[j, 1])
            dist = maxang - angle
            J = jnp.zeros(m.nv, d.qpos.dtype).at[dadr:dadr + 3].set(-axis)
            vel = J @ d.qvel
            rows.append(_row(m, J, dist - margin, m.jnt_solref[j],
                             m.jnt_solimp[j],
                             m.dof_invweight0[dadr], LIMIT, vel,
                             active=dist - margin < 0))
    for t in range(m.ntendon):
        if not m.tendon_limited[t]:
            continue
        margin = m.tendon_margin[t]
        ln = d.ten_length[t]
        J_base = d.ten_moment[t]
        for side, sign in ((0, 1.0), (1, -1.0)):
            dist = sign * (ln - m.tendon_range[t, side])
            J = sign * J_base
            vel = J @ d.qvel
            rows.append(_row(m, J, dist - margin, m.tendon_solref_lim[t],
                             m.tendon_solimp_lim[t],
                             m.tendon_invweight0[t], LIMIT, vel,
                             active=dist - margin < 0))
    return rows


def _contact_rows(m: Model, d: Data, offset: int = 0):
    rows = []
    spans = []
    con = d.contact
    for c in range(len(con.dim)):
        g1, g2 = con.geom1[c], con.geom2[c]
        b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
        condim = con.dim[c]
        pos_eff = con.dist[c] - con.includemargin[c]
        frame = con.frame[c]  # rows: n, t1, t2
        jac1p, jac1r = kin.jac(m, d, con.pos[c], b1)
        jac2p, jac2r = kin.jac(m, d, con.pos[c], b2)
        jdiffp = jac2p - jac1p  # relative velocity of geom2 wrt geom1
        jn = frame[0] @ jdiffp
        inv = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        solref, solimp = con.solref[c], con.solimp[c]
        start = offset + len(rows)
        if condim == 1:
            vel = jn @ d.qvel
            rows.append(_row(m, jn, pos_eff, solref, solimp, inv, LIMIT, vel,
                             active=pos_eff < 0))
            spans.append((c, start, 1))
            continue
        # pyramidal cone: 2*(condim-1) rows mixing normal and ±mu*tangent
        mu = con.friction[c]
        tan_jacs = [frame[1] @ jdiffp, frame[2] @ jdiffp]
        if condim > 3:
            jdiffr = jac2r - jac1r
            tan_jacs.append(frame[0] @ jdiffr)  # torsional
        if condim > 4:
            tan_jacs.append(frame[1] @ jdiffr)
            tan_jacs.append(frame[2] @ jdiffr)
        # row regularization follows MuJoCo's pyramidal diagApprox:
        # 2 mu0^2 (1 + mu0^2) invweight / impratio, same for every row
        inv_pyr = (inv + mu[0] * mu[0] * inv) * 2.0 * mu[0] * mu[0] \
            / m.opt.impratio
        for i in range(condim - 1):
            for sign in (1.0, -1.0):
                J = jn + sign * mu[i] * tan_jacs[i]
                vel = J @ d.qvel
                rows.append(_row(m, J, pos_eff, solref, solimp, inv_pyr,
                                 LIMIT, vel, active=pos_eff < 0))
        spans.append((c, start, 2 * (condim - 1)))
    return rows, spans
