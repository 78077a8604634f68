"""Actuator transmission, activation dynamics, and force generation.

Implements mj_transmission / mj_fwdActuation for the general actuator model
(gain/bias/dynamics), covering the shortcut types used by the reference
suite: motor, position, velocity, general (incl. filter/integrator
dynamics) over joint, tendon, and site transmissions.
"""

from __future__ import annotations

import jax.numpy as jnp

from dm_control_tpu.physics.model import (
    BiasType, Data, DisableBit, DynType, GainType, JointType, Model, TrnType,
)


def transmission(m: Model, d: Data) -> Data:
    """mj_transmission: actuator lengths and moment arms."""
    if m.nu == 0:
        return d
    dtype = d.qpos.dtype

    # fast path: every actuator drives a scalar joint (all suite domains
    # except tendon-driven ones) — one gather + one scatter
    import numpy as np

    all_scalar = all(
        m.actuator_trntype[u] in (int(TrnType.JOINT),
                                  int(TrnType.JOINTINPARENT))
        and m.jnt_type[m.actuator_trnid[u][0]] in (int(JointType.SLIDE),
                                                   int(JointType.HINGE))
        for u in range(m.nu))
    if all_scalar:
        jids = np.array([m.actuator_trnid[u][0] for u in range(m.nu)])
        qadr = np.array([m.jnt_qposadr[j] for j in jids])
        dadr = np.array([m.jnt_dofadr[j] for j in jids])
        gear0 = m.actuator_gear[:, 0]
        lengths = gear0 * d.qpos[qadr]
        moment = jnp.zeros((m.nu, m.nv), dtype).at[
            jnp.arange(m.nu), jnp.asarray(dadr)].set(gear0)
        return d.replace(actuator_length=lengths, actuator_moment=moment)

    lengths = []
    moments = []
    for u in range(m.nu):
        trn = TrnType(m.actuator_trntype[u])
        tid = m.actuator_trnid[u][0]
        gear = m.actuator_gear[u]
        if trn in (TrnType.JOINT, TrnType.JOINTINPARENT):
            jtype = JointType(m.jnt_type[tid])
            qadr, dadr = m.jnt_qposadr[tid], m.jnt_dofadr[tid]
            if jtype in (JointType.SLIDE, JointType.HINGE):
                lengths.append(gear[0] * d.qpos[qadr])
                moments.append(
                    jnp.zeros(m.nv, dtype).at[dadr].set(gear[0]))
            elif jtype == JointType.BALL:
                # torque gear[0:3] in joint frame; length undefined (0)
                lengths.append(jnp.zeros((), dtype))
                moments.append(
                    jnp.zeros(m.nv, dtype).at[dadr:dadr + 3].set(gear[:3]))
            else:  # FREE: wrench in world frame
                lengths.append(jnp.zeros((), dtype))
                mom = jnp.zeros(m.nv, dtype)
                mom = mom.at[dadr:dadr + 3].set(gear[:3])
                mom = mom.at[dadr + 3:dadr + 6].set(gear[3:6])
                moments.append(mom)
        elif trn == TrnType.TENDON:
            lengths.append(gear[0] * d.ten_length[tid])
            moments.append(gear[0] * d.ten_moment[tid])
        elif trn == TrnType.SITE:
            from dm_control_tpu.physics import kinematics as kin

            jacp, jacr = kin.jac_site(m, d, tid)
            # gear is a wrench in the site frame
            frame = d.site_xmat[tid]
            force = frame @ gear[:3]
            torque = frame @ gear[3:6]
            lengths.append(jnp.zeros((), dtype))
            moments.append(jacp.T @ force + jacr.T @ torque)
        else:
            raise NotImplementedError(f"transmission {trn}")
    return d.replace(actuator_length=jnp.stack(lengths),
                     actuator_moment=jnp.stack(moments))


def actuator_velocity(m: Model, d: Data) -> Data:
    if m.nu == 0:
        return d
    return d.replace(actuator_velocity=d.actuator_moment @ d.qvel)


def fwd_actuation(m: Model, d: Data) -> Data:
    """mj_fwdActuation: activation derivatives, forces, generalized forces."""
    dtype = d.qpos.dtype
    if m.nu == 0 or (m.opt.disableflags & DisableBit.ACTUATION):
        return d.replace(qfrc_actuator=jnp.zeros(m.nv, dtype),
                         actuator_force=jnp.zeros(m.nu, dtype))

    ctrl = d.ctrl
    if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
        limited = jnp.array(m.actuator_ctrllimited, bool)
        ctrl = jnp.where(
            limited,
            jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                     m.actuator_ctrlrange[:, 1]),
            ctrl)

    # activation dynamics
    act_dot = jnp.zeros(m.na, dtype)
    inputs = []
    for u in range(m.nu):
        dyn = DynType(m.actuator_dyntype[u])
        if dyn == DynType.NONE:
            inputs.append(ctrl[u])
            continue
        a = m.actuator_actadr[u]
        if dyn == DynType.INTEGRATOR:
            act_dot = act_dot.at[a].set(ctrl[u])
        elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
            tau = jnp.maximum(m.actuator_dynprm[u, 0], 1e-15)
            act_dot = act_dot.at[a].set((ctrl[u] - d.act[a]) / tau)
        else:
            raise NotImplementedError(f"dyntype {dyn}")
        inputs.append(d.act[a])
    inp = jnp.stack(inputs)

    # gain and bias
    ln, vel = d.actuator_length, d.actuator_velocity
    gp, bp = m.actuator_gainprm, m.actuator_biasprm
    gaintypes = jnp.array(m.actuator_gaintype)
    gain = jnp.where(gaintypes == int(GainType.FIXED), gp[:, 0],
                     gp[:, 0] + gp[:, 1] * ln + gp[:, 2] * vel)
    biastypes = jnp.array(m.actuator_biastype)
    bias = jnp.where(biastypes == int(BiasType.NONE),
                     jnp.zeros(m.nu, dtype),
                     bp[:, 0] + bp[:, 1] * ln + bp[:, 2] * vel)
    force = gain * inp + bias

    flimited = jnp.array(m.actuator_forcelimited, bool)
    force = jnp.where(
        flimited,
        jnp.clip(force, m.actuator_forcerange[:, 0],
                 m.actuator_forcerange[:, 1]),
        force)

    qfrc = d.actuator_moment.T @ force
    return d.replace(act_dot=act_dot, actuator_force=force,
                     qfrc_actuator=qfrc)
