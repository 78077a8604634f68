"""Soft-constraint row assembly (mj_makeConstraint analogue), vectorized.

Builds the efc system for the solver: equality constraints, dof friction
loss, joint/tendon limits, and contact rows (pyramidal friction cones).
Row structure (kinds, counts) is static per model; limit and contact blocks
are assembled as batched array ops (one impedance/aref evaluation over all
rows), so the traced graph size is independent of the number of contacts.

MuJoCo's soft-constraint model: each row has impedance d(pos) from solimp,
reference acceleration aref from solref, and regularization
R = (1 - d)/d * diagApprox, D = 1/R.  Rows MuJoCo would not instantiate
(dist >= margin) are carried with D = 0.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
CONE = 3  # elliptic-cone contact rows (grouped per contact)


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
    # per condim-group: (contact_indices, first_row, rows_per_contact) —
    # contact normal forces are recovered group-wise (vectorized)
    contact_spans: Tuple[Tuple[Tuple[int, ...], int, int], ...] = \
        static_field(default=())
    # elliptic-cone groups: (contact_indices, first_row, condim); each
    # contact occupies ``condim`` consecutive rows (normal, tangents,
    # torsion, rolls) handled jointly by the solver's cone cost
    cone_spans: Tuple[Tuple[Tuple[int, ...], int, int], ...] = \
        static_field(default=())
    # Contact-compaction bookkeeping (opt.contact_cap > 0, f32 path):
    # sel_spans are (sel_offset, first_row, rows_per_contact, k) for
    # groups whose contacts were top-k selected per environment;
    # contact_selids[sel_offset:sel_offset+k] holds the selected
    # candidate indices (traced — selection is state-dependent), used to
    # scatter recovered forces back to the full candidate arrays.
    sel_spans: Tuple[Tuple[int, int, int, int], ...] = \
        static_field(default=())
    contact_selids: jax.Array = None

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
    # MuJoCo clamps the endpoints dmin/dmax into [mjMINIMP, mjMAXIMP]
    # BEFORE interpolating (so solimp d0=0 behaves as d0=1e-4), verified
    # empirically against mj_forward efc_D on a probe model.
    dmin = jnp.clip(dmin, _MINIMP, _MAXIMP)
    dmax = jnp.clip(dmax, _MINIMP, _MAXIMP)
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
    k_dir = -solref[..., 0] * imp
    b_dir = -solref[..., 1]
    direct = solref[..., 0] <= 0
    k = jnp.where(direct, k_dir, k_std)
    b = jnp.where(direct, b_dir, b_std)
    return k, b, imp


class _Blocks:
    """Accumulates constraint row blocks as arrays."""

    def __init__(self, m: Model, dtype):
        self.m = m
        self.dtype = dtype
        self.J: List = []
        self.pos: List = []
        self.solref: List = []
        self.solimp: List = []
        self.diag: List = []
        self.vel: List = []
        self.floss: List = []
        self.active: List = []
        self.kinds: List[int] = []
        self._raw_rows: List = []

    def add(self, J, pos, solref, solimp, diag, vel, kind, floss=None,
            active=None):
        # raw rows are concatenated after computed rows at build time, so
        # computed rows must all be added first (contacts come last in
        # make_constraint, and only elliptic contacts use add_raw)
        assert not self._raw_rows, "add() after add_raw() breaks row order"
        """Adds a block of rows.  All args are arrays with leading dim R
        (or broadcastable); ``kind`` is a single static int for the block."""
        J = jnp.atleast_2d(J)
        r = J.shape[0]
        self.J.append(J)
        self.pos.append(jnp.broadcast_to(jnp.asarray(pos, self.dtype), (r,)))
        self.solref.append(jnp.broadcast_to(solref, (r, 2)))
        self.solimp.append(jnp.broadcast_to(solimp, (r, 5)))
        self.diag.append(jnp.broadcast_to(jnp.asarray(diag, self.dtype),
                                          (r,)))
        self.vel.append(jnp.broadcast_to(jnp.asarray(vel, self.dtype), (r,)))
        fl = jnp.zeros((r,), self.dtype) if floss is None else \
            jnp.broadcast_to(jnp.asarray(floss, self.dtype), (r,))
        self.floss.append(fl)
        act = jnp.ones((r,), bool) if active is None else \
            jnp.broadcast_to(jnp.asarray(active, bool), (r,))
        self.active.append(act)
        self.kinds.extend([kind] * r)

    @property
    def nrows(self) -> int:
        return len(self.kinds)

    def add_raw(self, J, aref, D, R, pos, kind):
        """Adds rows with precomputed aref/D/R (elliptic-cone contacts,
        whose friction rows derive D from the normal row's impedance
        rather than their own solref/solimp evaluation)."""
        J = jnp.atleast_2d(J)
        r = J.shape[0]
        self._raw_rows.append((J, jnp.broadcast_to(aref, (r,)),
                               jnp.broadcast_to(D, (r,)),
                               jnp.broadcast_to(R, (r,)),
                               jnp.broadcast_to(jnp.asarray(pos, self.dtype),
                                                (r,))))
        self.kinds.extend([kind] * r)

    def build(self, contact_spans, cone_spans=(), sel_spans=(),
              contact_selids=None) -> Efc:
        m, dtype = self.m, self.dtype
        if not self.kinds:
            z = jnp.zeros((0,), dtype)
            return Efc(J=jnp.zeros((0, m.nv), dtype), D=z, R=z, aref=z,
                       pos=z, floss=z, kind=(), contact_spans=(),
                       cone_spans=())
        if self.J:
            J = jnp.concatenate(self.J)
            pos = jnp.concatenate(self.pos)
            solref = jnp.concatenate(self.solref)
            solimp = jnp.concatenate(self.solimp)
            diag = jnp.concatenate(self.diag)
            vel = jnp.concatenate(self.vel)
            floss = jnp.concatenate(self.floss)
            active = jnp.concatenate(self.active)
            k, b, imp = kbi(m, solref, solimp, pos)
            aref = -b * vel - k * pos
            r_reg = jnp.maximum(_MINVAL, (1.0 - imp) / imp * diag)
            d_vec = jnp.where(active, 1.0 / r_reg, 0.0)
        else:
            J = jnp.zeros((0, m.nv), dtype)
            pos = aref = r_reg = d_vec = floss = jnp.zeros((0,), dtype)
        if self._raw_rows:
            zf = jnp.zeros((sum(r[0].shape[0] for r in self._raw_rows),),
                           dtype)
            J = jnp.concatenate([J] + [r[0] for r in self._raw_rows])
            aref = jnp.concatenate([aref] + [r[1] for r in self._raw_rows])
            d_vec = jnp.concatenate([d_vec] + [r[2] for r in self._raw_rows])
            r_reg = jnp.concatenate([r_reg] + [r[3] for r in self._raw_rows])
            pos = jnp.concatenate([pos] + [r[4] for r in self._raw_rows])
            floss = jnp.concatenate([floss, zf])
        return Efc(J=J, D=d_vec, R=r_reg, aref=aref, pos=pos, floss=floss,
                   kind=tuple(self.kinds), contact_spans=contact_spans,
                   cone_spans=cone_spans, sel_spans=sel_spans,
                   contact_selids=contact_selids)


def make_constraint(m: Model, d: Data) -> Efc:
    dtype = d.qpos.dtype
    blocks = _Blocks(m, dtype)
    dis = m.opt.disableflags
    contact_spans: Tuple = ()
    cone_spans: Tuple = ()
    sel_spans: Tuple = ()
    selids = None
    if not (dis & DisableBit.CONSTRAINT):
        if not (dis & DisableBit.EQUALITY):
            _equality_rows(m, d, blocks)
        if not (dis & DisableBit.FRICTIONLOSS):
            _frictionloss_rows(m, d, blocks)
        if not (dis & DisableBit.LIMIT):
            _limit_rows(m, d, blocks)
        if not (dis & DisableBit.CONTACT):
            cap = int(getattr(m.opt, "contact_cap", 0) or 0)
            # engage only if some condim GROUP exceeds the cap — the
            # selection is per group, so a total above the cap with
            # every group under it would take the dynamic-gather path
            # (measured ~30% slower) without dropping a single row
            dims = np.array(d.contact.dim)
            biggest = max((int((dims == c).sum()) for c in set(d.contact.dim)),
                          default=0)
            if (cap > 0 and dtype == jnp.float32
                    and int(m.opt.cone) != 1
                    and int(getattr(m.opt, "noslip_iterations", 0)) == 0
                    and biggest > cap):
                sel_spans, selids = _contact_rows_compact(m, d, blocks, cap)
            else:
                contact_spans, cone_spans = _contact_rows(m, d, blocks)
    return blocks.build(contact_spans, cone_spans, sel_spans, selids)


# ---------------------------------------------------------------------------
# Equality (few rows; per-constraint construction).
# ---------------------------------------------------------------------------


def _equality_rows(m: Model, d: Data, blocks: _Blocks):
    from dm_control_tpu.physics import mathx as mx

    for e in range(m.neq):
        etype = EqType(m.eq_type[e])
        solref, solimp = m.eq_solref[e], m.eq_solimp[e]
        if etype == EqType.CONNECT:
            b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
            anchor = m.eq_data[e, :3]
            p1 = d.xpos[b1] + d.xmat[b1] @ anchor
            p2 = d.xpos[b2] + d.xmat[b2] @ m.eq_data[e, 3:6]
            (jac1p, _), (jac2p, _) = (kin.jac(m, d, p1, b1),
                                      kin.jac(m, d, p2, b2))
            jdiff = jac1p - jac2p
            pos3 = p1 - p2
            inv = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            blocks.add(jdiff, pos3, solref, solimp, inv, jdiff @ d.qvel,
                       EQUALITY)
        elif etype == EqType.JOINT:
            j1, j2 = m.eq_obj1id[e], m.eq_obj2id[e]
            poly = m.eq_data[e, :5]
            a1, d1 = m.jnt_qposadr[j1], m.jnt_dofadr[j1]
            q1 = d.qpos[a1] - m.qpos0[a1]
            J = jnp.zeros(m.nv, blocks.dtype).at[d1].set(1.0)
            if j2 >= 0:
                a2, d2adr = m.jnt_qposadr[j2], m.jnt_dofadr[j2]
                q2 = d.qpos[a2] - m.qpos0[a2]
                dpoly = (poly[1] + 2 * poly[2] * q2 + 3 * poly[3] * q2 ** 2
                         + 4 * poly[4] * q2 ** 3)
                val = (poly[0] + poly[1] * q2 + poly[2] * q2 ** 2
                       + poly[3] * q2 ** 3 + poly[4] * q2 ** 4)
                J = J.at[d2adr].set(-dpoly)
                pos = q1 - val
                inv = m.dof_invweight0[d1] + m.dof_invweight0[d2adr]
            else:
                pos = q1 - poly[0]
                inv = m.dof_invweight0[d1]
            blocks.add(J[None], pos, solref, solimp, inv, J @ d.qvel,
                       EQUALITY)
        elif etype == EqType.TENDON:
            t1, t2 = m.eq_obj1id[e], m.eq_obj2id[e]
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
            blocks.add(J[None], pos, solref, solimp, inv, J @ d.qvel,
                       EQUALITY)
        elif etype == EqType.WELD:
            b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
            anchor = m.eq_data[e, :3]
            relpose = m.eq_data[e, 3:10]
            torquescale = m.eq_data[e, 10]
            p1 = d.xpos[b1] + d.xmat[b1] @ anchor
            p2 = d.xpos[b2] + d.xmat[b2] @ anchor
            jac1p, jac1r = kin.jac(m, d, p1, b1)
            jac2p, jac2r = kin.jac(m, d, p2, b2)
            jdiffp = jac1p - jac2p
            jdiffr = (jac1r - jac2r) * torquescale
            q1 = d.xquat[b1]
            q2 = mx.quat_mul(d.xquat[b2], relpose[3:7])
            rot3 = mx.quat_sub(q1, q2) * torquescale
            inv_t = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
            inv_r = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
            blocks.add(jdiffp, p1 - p2, solref, solimp, inv_t,
                       jdiffp @ d.qvel, EQUALITY)
            blocks.add(jdiffr, rot3, solref, solimp, inv_r,
                       jdiffr @ d.qvel, EQUALITY)
        else:
            raise NotImplementedError(f"equality {etype}")


# ---------------------------------------------------------------------------
# Friction loss (vectorized over dofs with frictionloss > 0).
# ---------------------------------------------------------------------------


def _frictionloss_rows(m: Model, d: Data, blocks: _Blocks):
    floss = np.asarray(m.dof_frictionloss)
    idx = np.nonzero(floss > 0)[0]
    if idx.size == 0:
        return
    J = jnp.zeros((idx.size, m.nv), blocks.dtype)
    J = J.at[jnp.arange(idx.size), jnp.asarray(idx)].set(1.0)
    blocks.add(J, jnp.zeros(idx.size, blocks.dtype),
               m.dof_solref[idx], m.dof_solimp[idx],
               m.dof_invweight0[idx], d.qvel[idx], FRICTIONLOSS,
               floss=m.dof_frictionloss[idx])


# ---------------------------------------------------------------------------
# Limits (vectorized over limited scalar joints; ball/tendon per-item).
# ---------------------------------------------------------------------------


def _limit_rows(m: Model, d: Data, blocks: _Blocks):
    from dm_control_tpu.physics import mathx as mx

    scalar = [j for j in range(m.njnt)
              if m.jnt_limited[j]
              and m.jnt_type[j] in (int(JointType.HINGE),
                                    int(JointType.SLIDE))]
    if scalar:
        qadr = np.array([m.jnt_qposadr[j] for j in scalar])
        dadr = np.array([m.jnt_dofadr[j] for j in scalar])
        L = len(scalar)
        q = d.qpos[qadr]  # (L,)
        qd = d.qvel[dadr]
        jr = m.jnt_range[np.array(scalar)]
        margin = m.jnt_margin[np.array(scalar)]
        # two rows per joint: lower (sign +1), upper (sign -1)
        dist = jnp.stack([q - jr[:, 0], jr[:, 1] - q], 1).reshape(-1)
        signs = jnp.tile(jnp.array([1.0, -1.0], blocks.dtype), L)
        rows = jnp.arange(2 * L)
        cols = jnp.asarray(np.repeat(dadr, 2))
        J = jnp.zeros((2 * L, m.nv), blocks.dtype).at[rows, cols].set(signs)
        pos = dist - jnp.repeat(margin, 2)
        vel = jnp.repeat(qd, 2) * signs
        rep2 = lambda x: jnp.repeat(x, 2, axis=0)
        blocks.add(J, pos, rep2(m.jnt_solref[np.array(scalar)]),
                   rep2(m.jnt_solimp[np.array(scalar)]),
                   jnp.repeat(m.dof_invweight0[dadr], 2), vel, LIMIT,
                   active=pos < 0)

    for j in range(m.njnt):
        if not m.jnt_limited[j] or m.jnt_type[j] != int(JointType.BALL):
            continue
        qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        rotvec = mx.quat_to_axis_angle(d.qpos[qadr:qadr + 4])
        angle = jnp.linalg.norm(rotvec)
        axis = rotvec / jnp.maximum(angle, _MINVAL)
        maxang = jnp.maximum(m.jnt_range[j, 0], m.jnt_range[j, 1])
        dist = maxang - angle
        J = jnp.zeros(m.nv, blocks.dtype).at[dadr:dadr + 3].set(-axis)
        pos = dist - m.jnt_margin[j]
        blocks.add(J[None], pos, m.jnt_solref[j], m.jnt_solimp[j],
                   m.dof_invweight0[dadr], J @ d.qvel, LIMIT,
                   active=pos < 0)

    for t in range(m.ntendon):
        if not m.tendon_limited[t]:
            continue
        ln = d.ten_length[t]
        for side, sign in ((0, 1.0), (1, -1.0)):
            dist = sign * (ln - m.tendon_range[t, side])
            J = sign * d.ten_moment[t]
            pos = dist - m.tendon_margin[t]
            blocks.add(J[None], pos, m.tendon_solref_lim[t],
                       m.tendon_solimp_lim[t], m.tendon_invweight0[t],
                       J @ d.qvel, LIMIT, active=pos < 0)


# ---------------------------------------------------------------------------
# Contacts (fully vectorized; grouped by condim).
# ---------------------------------------------------------------------------


def _contact_rows(m: Model, d: Data, blocks: _Blocks):
    con = d.contact
    ncon = len(con.dim)
    if ncon == 0:
        return (), ()
    dtype = blocks.dtype
    b1s = tuple(m.geom_bodyid[g] for g in con.geom1)
    b2s = tuple(m.geom_bodyid[g] for g in con.geom2)
    jac1p, jac1r = kin.jac_points(m, d, con.pos, b1s)
    jac2p, jac2r = kin.jac_points(m, d, con.pos, b2s)
    jdp = jac2p - jac1p  # (ncon, 3, nv)
    jdr = jac2r - jac1r

    # frame-projected jacobian rows
    jn = jnp.einsum("ki,kiv->kv", con.frame[:, 0, :], jdp)
    jt = [jnp.einsum("ki,kiv->kv", con.frame[:, 1, :], jdp),
          jnp.einsum("ki,kiv->kv", con.frame[:, 2, :], jdp),
          jnp.einsum("ki,kiv->kv", con.frame[:, 0, :], jdr),
          jnp.einsum("ki,kiv->kv", con.frame[:, 1, :], jdr),
          jnp.einsum("ki,kiv->kv", con.frame[:, 2, :], jdr)]

    pos_eff = con.dist - con.includemargin
    inv = (m.body_invweight0[jnp.array(b1s), 0]
           + m.body_invweight0[jnp.array(b2s), 0])
    mu0 = con.friction[:, 0]
    # MuJoCo's pyramidal diagApprox: 2 mu0^2 (1 + mu0^2) invweight/impratio
    inv_pyr = (inv + mu0 * mu0 * inv) * 2.0 * mu0 * mu0 / m.opt.impratio

    # group contacts by condim (static)
    elliptic = int(m.opt.cone) == 1
    dims = np.array(con.dim)
    spans = []
    cone_spans = []
    row_base = len(blocks.kinds)

    for condim in sorted(set(con.dim)):
        idx = np.nonzero(dims == condim)[0]
        k = idx.size
        # When one condim group covers every contact (the common case)
        # skip the per-group gathers entirely: smaller graphs, and it
        # dodges a gather-fusion XLA:CPU miscompile observed on
        # humanoid_CMU (wrong pos gathered inside large fused programs).
        whole = k == ncon and bool(np.array_equal(idx, np.arange(ncon)))
        gidx = slice(None) if whole else jnp.asarray(idx)
        if condim == 1:
            J = jn[gidx]
            nrows = 1
            blocks.add(J, pos_eff[gidx], con.solref[gidx], con.solimp[gidx],
                       inv[gidx], jnp.einsum("kv,v->k", J, d.qvel), LIMIT,
                       active=pos_eff[gidx] < 0)
            spans.append((tuple(int(c) for c in idx), row_base, nrows))
        elif elliptic:
            # elliptic cone: condim rows per contact (normal, tangents,
            # torsion, rolls), handled jointly by the solver's cone cost.
            # Empirically matched against mj_forward efc rows (mujoco 3.10,
            # cone=elliptic): friction-row aref = -b*vel (no position
            # term); friction-row D = D0 * impratio * (fric_j/fric_0)^2.
            nrows = condim
            kk, b, imp = kbi(m, con.solref[gidx], con.solimp[gidx],
                             pos_eff[gidx])
            # m.opt constants may be f64 while the data pipeline is f32
            kk = jnp.asarray(kk, dtype)
            b = jnp.asarray(b, dtype)
            imp = jnp.asarray(imp, dtype)
            r0 = jnp.maximum(_MINVAL, (1.0 - imp) / imp
                             * jnp.asarray(inv[gidx], dtype))
            active = pos_eff[gidx] < 0
            d0 = jnp.where(active, 1.0 / r0, jnp.zeros((), dtype))
            fri = jnp.asarray(con.friction[gidx, :condim - 1], dtype)
            dj = (d0[:, None] * jnp.asarray(m.opt.impratio, dtype)
                  * (fri / fri[:, :1]) ** 2)  # (k, condim-1)
            Jg = jnp.stack([jn[gidx]] + [jt[i][gidx]
                                         for i in range(condim - 1)],
                           axis=1)  # (k, condim, nv)
            vel = jnp.einsum("krv,v->kr", Jg, d.qvel)
            aref = -b[:, None] * vel
            aref = aref.at[:, 0].add(-kk * pos_eff[gidx])
            D = jnp.concatenate([d0[:, None], dj], axis=1)  # (k, condim)
            R = 1.0 / jnp.maximum(D, _MINVAL)
            blocks.add_raw(Jg.reshape(k * condim, m.nv),
                           aref.reshape(-1), D.reshape(-1), R.reshape(-1),
                           jnp.repeat(pos_eff[gidx], condim), CONE)
            cone_spans.append((tuple(int(c) for c in idx), row_base,
                               condim))
        else:
            nfd = condim - 1  # friction dimensions
            rows = []
            for i in range(nfd):
                mu_i = con.friction[gidx, i]
                ti = jt[i][gidx]
                rows.append(jn[gidx] + mu_i[:, None] * ti)
                rows.append(jn[gidx] - mu_i[:, None] * ti)
            # interleave: (k, 2*nfd, nv) with row order (+t0,-t0,+t1,-t1,..)
            J = jnp.stack(rows, axis=1).reshape(k * 2 * nfd, m.nv)
            nrows = 2 * nfd
            rep = lambda x: jnp.repeat(x, nrows, axis=0)
            blocks.add(J, rep(pos_eff[gidx]), rep(con.solref[gidx]),
                       rep(con.solimp[gidx]), rep(inv_pyr[gidx]),
                       jnp.einsum("kv,v->k", J, d.qvel), LIMIT,
                       active=rep(pos_eff[gidx]) < 0)
            spans.append((tuple(int(c) for c in idx), row_base, nrows))
        row_base += k * nrows
    return tuple(spans), tuple(cone_spans)


def _contact_rows_compact(m: Model, d: Data, blocks: _Blocks, cap: int):
    """Contact rows with per-environment top-k depth selection.

    The f32 throughput variant of ``_contact_rows`` (opt.contact_cap):
    within each condim group only the ``cap`` deepest candidates enter
    the constraint system, so solver row count tracks the number of
    contacts that can PLAUSIBLY be active rather than the number of
    pairs the static broadphase admits.  Selection indices are traced
    data; jacobians are built through the dynamic-bodyid path of
    kin.jac_points.  Returns (sel_spans, contact_selids) for force
    scatter-back; the candidate arrays in d.contact keep their full
    static size (observations/sensors are unaffected).

    The reference reaches the same end state through mjData's dynamic
    ncon (dm_control/mujoco/engine.py:161-166 steps native mj_step,
    which only instantiates touching contacts); a fixed top-k is the
    static-shape equivalent.
    """
    con = d.contact
    dtype = blocks.dtype
    pos_eff_all = con.dist - con.includemargin
    geom_body = jnp.asarray(m.geom_bodyid, jnp.int32)
    g1_all = jnp.asarray(con.geom1, jnp.int32)
    g2_all = jnp.asarray(con.geom2, jnp.int32)
    dims = np.array(con.dim)

    sel_spans = []
    sel_parts = []
    sel_off = 0
    row_base = len(blocks.kinds)
    for condim in sorted(set(con.dim)):
        idx = np.nonzero(dims == condim)[0]
        k = int(idx.size)
        kk = min(k, cap)
        if kk < k:
            gi = jnp.asarray(idx)
            # deepest first; inactive rows past the active count are
            # carried with D = 0 exactly like the uncompacted path
            _, sel = jax.lax.top_k(-pos_eff_all[gi], kk)
            gsel = gi[sel]
        else:
            gsel = jnp.asarray(idx)
        b1 = geom_body[g1_all[gsel]]
        b2 = geom_body[g2_all[gsel]]
        posk = con.pos[gsel]
        jac1p, jac1r = kin.jac_points(m, d, posk, b1)
        jac2p, jac2r = kin.jac_points(m, d, posk, b2)
        jdp = jac2p - jac1p  # (kk, 3, nv)
        frame = con.frame[gsel]
        jn = jnp.einsum("ki,kiv->kv", frame[:, 0, :], jdp)
        pe = pos_eff_all[gsel]
        inv = (m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
        solref = con.solref[gsel]
        solimp = con.solimp[gsel]
        if condim == 1:
            nrows = 1
            blocks.add(jn, pe, solref, solimp, inv,
                       jnp.einsum("kv,v->k", jn, d.qvel), LIMIT,
                       active=pe < 0)
        else:
            mu = con.friction[gsel]  # (kk, 5)
            mu0 = mu[:, 0]
            inv_pyr = ((inv + mu0 * mu0 * inv) * 2.0 * mu0 * mu0
                       / m.opt.impratio)
            nfd = condim - 1
            if nfd > 2:
                jdr = jac2r - jac1r
            # friction axis order matches the uncompacted jt list:
            # t1·jdp, t2·jdp, n·jdr, t1·jdr, t2·jdr
            rows = []
            for i in range(nfd):
                if i < 2:
                    ti = jnp.einsum("ki,kiv->kv", frame[:, 1 + i, :], jdp)
                else:
                    ti = jnp.einsum("ki,kiv->kv", frame[:, i - 2, :], jdr)
                mu_i = mu[:, i]
                rows.append(jn + mu_i[:, None] * ti)
                rows.append(jn - mu_i[:, None] * ti)
            J = jnp.stack(rows, axis=1).reshape(kk * 2 * nfd, m.nv)
            nrows = 2 * nfd
            rep = lambda x: jnp.repeat(x, nrows, axis=0)
            blocks.add(J, rep(pe), rep(solref), rep(solimp), rep(inv_pyr),
                       jnp.einsum("kv,v->k", J, d.qvel), LIMIT,
                       active=rep(pe) < 0)
        sel_spans.append((sel_off, row_base, nrows, kk))
        sel_parts.append(jnp.asarray(gsel, jnp.int32))
        sel_off += kk
        row_base += kk * nrows
    selids = (jnp.concatenate(sel_parts) if sel_parts
              else jnp.zeros((0,), jnp.int32))
    return tuple(sel_spans), selids
