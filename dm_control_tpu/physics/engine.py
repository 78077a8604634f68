"""Forward dynamics pipeline and integrators: the mj_forward/mj_step core.

The reference drives these stages through native mj_step1/mj_step2
(dm_control/mujoco/engine.py:149-166, Euler split so mjData stays in sync).
Here the pipeline is a pure function ``step: (Model, Data) -> Data`` —
batched with ``jax.vmap``, compiled once per model under ``jit`` (models are
closed over so their structure constant-folds into the XLA program).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import actuation as act_mod
from dm_control_tpu.physics import collision as coll
from dm_control_tpu.physics import constraints as cons
from dm_control_tpu.physics import dynamics as dyn
from dm_control_tpu.physics import inertia as inr
from dm_control_tpu.physics import kinematics as kin
from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics import sensors as sens
from dm_control_tpu.physics import solver as slv
from dm_control_tpu.physics.model import (
    Data, DisableBit, IntegratorType, JointType, Model, make_data,
)

# Divergence threshold (mjMAXVAL analogue).
MAXVAL = 1e10


# ---------------------------------------------------------------------------
# Pipeline stages.
# ---------------------------------------------------------------------------


def fwd_position(m: Model, d: Data) -> Data:
    d = kin.kinematics(m, d)
    d = kin.com_pos(m, d)
    d = kin.tendon(m, d)
    d = inr.crb(m, d)
    d = inr.factor_m(m, d)
    d = coll.collision(m, d)
    d = act_mod.transmission(m, d)
    return d


def fwd_velocity(m: Model, d: Data) -> Data:
    d = act_mod.actuator_velocity(m, d)
    if m.ntendon:
        d = d.replace(ten_velocity=d.ten_moment @ d.qvel)
    d = kin.com_vel(m, d)
    d = dyn.rne(m, d)
    d = dyn.passive(m, d)
    return d


def fwd_actuation(m: Model, d: Data) -> Data:
    return act_mod.fwd_actuation(m, d)


def fwd_acceleration(m: Model, d: Data) -> Data:
    qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_applied
                   + d.qfrc_actuator)
    if _any_nonzero_possible(d.xfrc_applied):
        qfrc_smooth = qfrc_smooth + dyn.xfrc_accumulate(m, d)
    qacc_smooth = inr.solve_m(m, d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def _any_nonzero_possible(x) -> bool:
    """True unless ``x`` is a concrete all-zero array (trace-time check)."""
    try:
        return bool(np.any(np.asarray(x)))
    except Exception:
        return True


def fwd_constraint(m: Model, d: Data) -> Data:
    efc = cons.make_constraint(m, d)
    if efc.nefc == 0:
        return d.replace(
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros_like(d.qfrc_smooth),
            contact_force=jnp.zeros_like(d.contact_force),
            contact_force_vec=jnp.zeros_like(d.contact_force_vec))
    return slv.solve(m, d, efc)


def forward(m: Model, d: Data) -> Data:
    """mj_forward: full forward dynamics at the current state."""
    d = fwd_position(m, d)
    d = sens.sensor_pos(m, d)
    d = fwd_velocity(m, d)
    d = sens.sensor_vel(m, d)
    d = fwd_actuation(m, d)
    d = fwd_acceleration(m, d)
    d = fwd_constraint(m, d)
    d = sens.sensor_acc(m, d)
    return d


# ---------------------------------------------------------------------------
# Integration.
# ---------------------------------------------------------------------------


def integrate_pos(m: Model, qpos, qvel, dt):
    """mj_integratePos: advances qpos by qvel*dt, quaternions on the manifold.

    All scalar (hinge/slide) joints advance in one gather+scatter; only
    quaternion carriers (free/ball) get per-joint manifold updates — on a
    typical suite model this is 2-3 ops instead of an njnt-long
    slice-and-concatenate chain.
    """
    scalar_q, scalar_d, quat_jids = [], [], []
    for jid in range(m.njnt):
        jtype = JointType(m.jnt_type[jid])
        if jtype in (JointType.HINGE, JointType.SLIDE):
            scalar_q.append(m.jnt_qposadr[jid])
            scalar_d.append(m.jnt_dofadr[jid])
        else:
            quat_jids.append(jid)
    if not quat_jids and len(scalar_q) == m.nq:
        return qpos + dt * qvel  # scalar-only model: layouts coincide
    out = qpos
    if scalar_q:
        qi = jnp.asarray(scalar_q)
        out = out.at[qi].set(qpos[qi] + dt * qvel[jnp.asarray(scalar_d)])
    for jid in quat_jids:
        qadr, dadr = m.jnt_qposadr[jid], m.jnt_dofadr[jid]
        if JointType(m.jnt_type[jid]) == JointType.FREE:
            out = out.at[qadr:qadr + 3].set(
                qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3])
            out = out.at[qadr + 3:qadr + 7].set(mx.quat_integrate(
                qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], dt))
        else:  # BALL
            out = out.at[qadr:qadr + 4].set(mx.quat_integrate(
                qpos[qadr:qadr + 4], qvel[dadr:dadr + 3], dt))
    return out


def _advance(m: Model, d: Data, qacc, act_dot, qvel_for_pos=None) -> Data:
    """Shared integration epilogue (mj_advance)."""
    dt = m.opt.timestep
    qvel = d.qvel + dt * qacc
    act = d.act + dt * act_dot if m.na else d.act
    qpos = integrate_pos(m, d.qpos,
                         qvel if qvel_for_pos is None else qvel_for_pos, dt)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + dt)


def euler(m: Model, d: Data) -> Data:
    """mj_Euler: semi-implicit, implicit in joint damping.

    v' = v + h (M + h diag(B))^{-1} (qfrc_smooth + qfrc_constraint); the
    damping force -B v is already inside qfrc_smooth via qfrc_passive.
    """
    damping = np.asarray(m.dof_damping) if not isinstance(
        m.dof_damping, jax.core.Tracer) else None
    has_damping = damping is None or bool(np.any(damping))
    if not has_damping:
        return _advance(m, d, d.qacc, d.act_dot)
    dt = m.opt.timestep
    mh = d.qM + dt * jnp.diag(m.dof_damping)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    from dm_control_tpu.ops import linalg as ops_linalg

    qacc = ops_linalg.chol_solve(mh, qfrc)
    return _advance(m, d, qacc, d.act_dot)


_RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6, 1.0 / 3, 1.0 / 3, 1.0 / 6)


def rungekutta4(m: Model, d: Data) -> Data:
    """mj_RungeKutta with the classic 4th-order tableau."""
    h = m.opt.timestep
    d0 = d
    qvels = [d.qvel]
    qaccs = [d.qacc]
    act_dots = [d.act_dot]
    acts = [d.act]
    for i in range(3):
        arow = _RK4_A[i]
        dqvel = sum(a * qa for a, qa in zip(arow, qaccs) if a)
        dqact = sum(a * ad for a, ad in zip(arow, act_dots) if a) \
            if m.na else 0.0
        vel_i = d0.qvel + h * dqvel
        dvel_pos = sum(a * qv for a, qv in zip(arow, qvels) if a)
        qpos_i = integrate_pos(m, d0.qpos, dvel_pos, h)
        act_i = d0.act + h * dqact if m.na else d0.act
        di = d0.replace(qpos=qpos_i, qvel=vel_i, act=act_i)
        di = forward(m, di)
        qvels.append(di.qvel)
        qaccs.append(di.qacc)
        act_dots.append(di.act_dot)
        acts.append(di.act)
    dvel = sum(b * qv for b, qv in zip(_RK4_B, qvels))
    dacc = sum(b * qa for b, qa in zip(_RK4_B, qaccs))
    qpos = integrate_pos(m, d0.qpos, dvel, h)
    qvel = d0.qvel + h * dacc
    if m.na:
        dact = sum(b * ad for b, ad in zip(_RK4_B, act_dots))
        act = d0.act + h * dact
    else:
        act = d0.act
    return d0.replace(qpos=qpos, qvel=qvel, act=act, time=d0.time + h)


def step(m: Model, d: Data) -> Data:
    """mj_step: forward dynamics + integration."""
    d = forward(m, d)
    d = d.replace(qacc_warmstart=d.qacc)
    if m.opt.integrator == int(IntegratorType.RK4):
        return rungekutta4(m, d)
    return euler(m, d)


def check_divergence(m: Model, d: Data):
    """Per-env divergence flag (replaces the warning-counter diff at
    dm_control/mujoco/engine.py:307-330 — cannot raise inside a batch)."""
    bad = jnp.logical_or(
        jnp.any(~jnp.isfinite(d.qpos)) | jnp.any(~jnp.isfinite(d.qvel)),
        jnp.any(jnp.abs(d.qpos) > MAXVAL) | jnp.any(jnp.abs(d.qvel) > MAXVAL))
    return bad


# ---------------------------------------------------------------------------
# Derived constants (mj_setConst).
# ---------------------------------------------------------------------------


def _is_simple_body(m: Model, b: int) -> bool:
    """MuJoCo 'simple body' check (body_simple): all joints are slides with
    world-aligned axes, com at the body frame origin, identity orientation,
    and no moving ancestors."""
    import numpy as np

    p = m.body_parentid[b]
    while p != 0:
        if m.body_dofnum[p] > 0:
            return False
        p = m.body_parentid[p]
    if any(m.body_parentid[c] == b for c in range(m.nbody) if c != b):
        return False  # child bodies couple the mass matrix
    if m.body_jntnum[b] == 0:
        return False
    quat = np.asarray(m.body_quat[b])
    if not np.allclose(quat, [1, 0, 0, 0]):
        return False
    if not np.allclose(np.asarray(m.body_ipos[b]), 0.0):
        return False
    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for j in range(jadr, jadr + jnum):
        if m.jnt_type[j] != int(JointType.SLIDE):
            return False
        axis = np.abs(np.asarray(m.jnt_axis[j]))
        if not (np.isclose(axis.max(), 1.0) and np.isclose(axis.sum(), 1.0)):
            return False
        if not np.allclose(np.asarray(m.jnt_pos[j]), 0.0):
            return False
    return True


def set_const(m: Model) -> Model:
    """Computes qpos0-derived constants: invweights, meaninertia, tendon
    reference lengths.  Host-side, runs once at compile."""
    dtype = m.qpos0.dtype
    d = make_data(m, dtype)
    d = kin.kinematics(m, d)
    d = kin.com_pos(m, d)
    d = kin.tendon(m, d)
    d = inr.crb(m, d)
    d = inr.factor_m(m, d)

    if m.nv:
        minv = inr.solve_m(m, d, jnp.eye(m.nv, dtype=dtype))
        # MuJoCo (mj_setConst) assigns each free joint's 3 translational /
        # 3 rotational dofs the MEAN of their diag(M^-1) entries, and each
        # ball joint's 3 dofs likewise; scalar joints get the raw diagonal.
        diag = np.asarray(jnp.diag(minv)).copy()
        for j in range(m.njnt):
            adr = int(m.jnt_dofadr[j])
            jt = int(m.jnt_type[j])
            if jt == int(JointType.FREE):
                diag[adr:adr + 3] = diag[adr:adr + 3].mean()
                diag[adr + 3:adr + 6] = diag[adr + 3:adr + 6].mean()
            elif jt == int(JointType.BALL):
                diag[adr:adr + 3] = diag[adr:adr + 3].mean()
        dof_invweight0 = jnp.asarray(diag, dtype)
        meaninertia = jnp.trace(d.qM) / m.nv
    else:
        dof_invweight0 = m.dof_invweight0
        meaninertia = jnp.asarray(1.0, dtype)

    # joint/@springdamper auto-tuning (mjCModel::AutoSpringDamper): with
    # (timeconst, dampratio) both positive, the compiler overrides
    # stiffness = I/(tc^2 dr^2) and damping = 2 I/tc, where I is the joint
    # inertia at qpos0 (1/dof_invweight0).  Verified bit-exact vs the
    # oracle on dog.xml's caudal joints (reference dm_control/suite/dog.xml
    # class 'caudal', springdamper="0.001 50").
    if any(sd[0] > 0 and sd[1] > 0 for sd in m.jnt_springdamper):
        iw = np.asarray(dof_invweight0)
        stiff = np.asarray(m.jnt_stiffness).copy()
        damp = np.asarray(m.dof_damping).copy()
        for j, (tc, dr) in enumerate(m.jnt_springdamper):
            if tc <= 0 or dr <= 0:
                continue
            dofs = [v for v in range(m.nv) if m.dof_jntid[v] == j]
            inertia = float(np.mean(1.0 / iw[dofs]))
            stiff[j] = inertia / (tc * tc * dr * dr)
            for v in dofs:
                damp[v] = 2.0 * inertia / tc
        m = m.replace(jnt_stiffness=jnp.asarray(stiff, dtype),
                      dof_damping=jnp.asarray(damp, dtype))

    biw = []
    for b in range(m.nbody):
        if m.nv == 0 or b == 0:
            biw.append(jnp.zeros(2, dtype))
            continue
        if _is_simple_body(m, b):
            # MuJoCo's 'simple body' fast path (body_simple != 0): only
            # world-aligned slide joints, com at the frame origin, static
            # ancestors → invweight = [1/mass, 0]
            biw.append(jnp.stack([
                1.0 / jnp.maximum(m.body_mass[b], 1e-15),
                jnp.zeros((), dtype)]))
            continue
        jacp, jacr = kin.jac(m, d, d.xipos[b], b)
        jt = jacp @ minv @ jacp.T
        jr = jacr @ minv @ jacr.T
        biw.append(jnp.stack([jnp.trace(jt) / 3.0, jnp.trace(jr) / 3.0]))
    body_invweight0 = jnp.stack(biw)

    if m.ntendon:
        ten_iw = jnp.einsum("tv,vw,tw->t", d.ten_moment, minv, d.ten_moment)
        length0 = d.ten_length
        # resolve springlength < 0 → rest length at qpos0
        ls = m.tendon_lengthspring
        ls = jnp.where(ls < 0, length0[:, None], ls)
        m = m.replace(tendon_length0=length0, tendon_invweight0=ten_iw,
                      tendon_lengthspring=ls)
    else:
        z = jnp.zeros(0, dtype)
        m = m.replace(tendon_length0=z, tendon_invweight0=z)

    if m.ncam:
        # Reference-pose camera constants (mj_setConst): world pose of each
        # camera at qpos0, stored as offsets used by the track/trackcom
        # modes at render time (reference dm_control/mujoco/engine.py:593
        # consumes these through mjv_updateScene -> mj_camlight).
        bid = jnp.asarray(m.cam_bodyid, jnp.int32)
        cam_xpos0 = d.xpos[bid] + jnp.einsum(
            "cij,cj->ci", d.xmat[bid], m.cam_pos)
        cam_xmat0 = d.xmat[bid] @ mx.quat_to_mat(m.cam_quat)
        m = m.replace(
            cam_pos0=cam_xpos0 - d.xpos[bid],
            cam_poscom0=cam_xpos0 - d.subtree_com[bid],
            cam_mat0=cam_xmat0,
        )

    return m.replace(
        dof_invweight0=dof_invweight0,
        body_invweight0=body_invweight0,
        stat=m.stat.replace(meaninertia=meaninertia),
    )
