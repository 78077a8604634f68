"""Velocity-stage dynamics: RNE bias forces and passive forces.

Implements mj_rne (Coriolis/centrifugal/gravitational bias) and mj_passive
(joint springs/dampers, tendon springs/dampers, inertia-box fluid drag) —
the forces the reference obtains inside native mj_step
(dm_control/mujoco/engine.py:161-166).
"""

from __future__ import annotations

import jax.numpy as jnp

from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics.model import (
    Data, DisableBit, JointType, Model,
)


def rne(m: Model, d: Data) -> Data:
    """Recursive Newton-Euler with qacc = 0: qfrc_bias."""
    dtype = d.qpos.dtype
    if m.nv == 0:
        return d.replace(qfrc_bias=jnp.zeros(0, dtype))

    gravity_on = not (m.opt.disableflags & DisableBit.GRAVITY)
    # world "acceleration" = -gravity (so that inertial forces include weight)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype),
                             -m.opt.gravity if gravity_on
                             else jnp.zeros(3, dtype)])

    # forward: body accelerations (velocity-product terms only) — the
    # ancestor-chain prefix sum is a static-mask matmul on the f32 path
    if dtype == jnp.float32 and m.nbody > 4:
        from dm_control_tpu.physics.model import (
            body_ancestor_mask, body_dof_mask,
        )

        per_dof = d.cdof_dot * d.qvel[:, None]  # (nv, 6)
        per_body = jnp.asarray(body_dof_mask(m), dtype) @ per_dof
        cacc = cacc0[None] + jnp.asarray(
            body_ancestor_mask(m), dtype) @ per_body
    else:
        cacc = [cacc0]
        for i in range(1, m.nbody):
            p = m.body_parentid[i]
            a = cacc[p]
            adr, num = m.body_dofadr[i], m.body_dofnum[i]
            if num:
                a = a + d.cdof_dot[adr:adr + num].T @ d.qvel[adr:adr + num]
            cacc.append(a)
        cacc = jnp.stack(cacc)

    # body inertial forces: f = I a + v x* (I v)
    cfrc = mx.inert_mul(d.cinert, cacc) + mx.force_cross(
        d.cvel, mx.inert_mul(d.cinert, d.cvel))

    # backward: subtree force totals (mask matmul on the f32 path)
    if dtype == jnp.float32 and m.nbody > 4:
        from dm_control_tpu.physics.model import body_subtree_mask

        cfrc_tot = jnp.asarray(body_subtree_mask(m), dtype) @ cfrc
    else:
        acc = [cfrc[i] for i in range(m.nbody)]
        for level in reversed(m.body_tree_levels):
            for i in level:
                p = m.body_parentid[i]
                acc[p] = acc[p] + acc[i]
        cfrc_tot = jnp.stack(acc)

    dofbody = jnp.array(m.dof_bodyid, jnp.int32)
    qfrc_bias = jnp.einsum("vk,vk->v", d.cdof, cfrc_tot[dofbody])
    return d.replace(qfrc_bias=qfrc_bias)


def passive(m: Model, d: Data) -> Data:
    """mj_passive: springs, dampers, and fluid (density/viscosity) forces."""
    dtype = d.qpos.dtype
    qfrc = jnp.zeros(m.nv, dtype)
    if m.opt.disableflags & DisableBit.PASSIVE:
        return d.replace(qfrc_passive=qfrc)

    # joint springs — scalar joints in one vectorized scatter; quaternion
    # joints (rare) individually
    import numpy as np

    stiff = np.asarray(m.jnt_stiffness)
    scalar = [j for j in range(m.njnt)
              if m.jnt_type[j] in (int(JointType.HINGE),
                                   int(JointType.SLIDE)) and stiff[j] != 0]
    if scalar:
        qadr = np.array([m.jnt_qposadr[j] for j in scalar])
        dadr = np.array([m.jnt_dofadr[j] for j in scalar])
        k = m.jnt_stiffness[np.array(scalar)]
        frc = -k * (d.qpos[qadr] - m.qpos_spring[qadr])
        qfrc = qfrc.at[jnp.asarray(dadr)].add(frc)
    for jid in range(m.njnt):
        jtype = JointType(m.jnt_type[jid])
        if jtype in (JointType.HINGE, JointType.SLIDE) or stiff[jid] == 0:
            continue
        qadr, dadr = m.jnt_qposadr[jid], m.jnt_dofadr[jid]
        k = m.jnt_stiffness[jid]
        if jtype == JointType.FREE:
            qfrc = qfrc.at[dadr:dadr + 3].add(
                -k * (d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]))
            dif = mx.quat_sub(d.qpos[qadr + 3:qadr + 7],
                              m.qpos_spring[qadr + 3:qadr + 7])
            qfrc = qfrc.at[dadr + 3:dadr + 6].add(-k * dif)
        elif jtype == JointType.BALL:
            dif = mx.quat_sub(d.qpos[qadr:qadr + 4],
                              m.qpos_spring[qadr:qadr + 4])
            qfrc = qfrc.at[dadr:dadr + 3].add(-k * dif)

    # joint dampers
    qfrc = qfrc - m.dof_damping * d.qvel

    # tendon springs/dampers
    if m.ntendon:
        low = m.tendon_lengthspring[:, 0]
        high = m.tendon_lengthspring[:, 1]
        ln = d.ten_length
        # spring force: active outside [low, high] (mj3 deadband semantics);
        # a scalar springlength < 0 means "rest length = reference length",
        # resolved at compile into both entries.
        frc_spring = jnp.where(
            ln > high, m.tendon_stiffness * (high - ln),
            jnp.where(ln < low, m.tendon_stiffness * (low - ln), 0.0))
        frc = frc_spring - m.tendon_damping * d.ten_velocity
        qfrc = qfrc + d.ten_moment.T @ frc

    # fluid forces (inertia-box model): swimmer/fish locomotion depends on
    # these (reference models set option density/viscosity).
    # NB: the gate must stay in numpy — a jnp comparison on closed-over
    # model constants is staged during jit tracing, so its bool() would
    # raise and silently keep the fluid term in every compiled graph
    # (~650 HLO ops per forward on a fluid-free model).
    use_fluid = True
    try:
        use_fluid = bool(float(m.opt.density) != 0.0 or
                         float(m.opt.viscosity) != 0.0 or
                         bool(np.any(np.asarray(m.opt.wind) != 0.0)))
    except Exception:
        pass  # traced option values: keep the fluid term
    if use_fluid:
        qfrc = qfrc + _fluid(m, d)

    return d.replace(qfrc_passive=qfrc)


def _fluid(m: Model, d: Data):
    """Inertia-box fluid model (mj_inertiaBoxFluidModel, engine_passive.c).

    Per body: approximates the body as a box with dimensions derived from
    its inertia, applies viscous (linear) and density (quadratic) drag to
    the 6D body velocity at the CoM, expressed in the inertial frame.
    """
    dtype = d.qpos.dtype
    qfrc = jnp.zeros(m.nv, dtype)
    for i in range(1, m.nbody):
        mass = m.body_mass[i]
        inert = m.body_inertia[i]  # principal moments
        # equivalent box half-dimensions... full dims per MuJoCo:
        # box[j] = sqrt(6*(sum(inert) - 2*inert[j]) / mass) / 2? MuJoCo uses
        # box_j = sqrt(6 * (i_k + i_l - i_j) / m) / 2 as half-size.
        i0, i1, i2 = inert[0], inert[1], inert[2]
        guard = 1e-12
        bx = jnp.sqrt(jnp.maximum(6.0 * (i1 + i2 - i0), guard)
                      / jnp.maximum(mass, guard)) / 2.0
        by = jnp.sqrt(jnp.maximum(6.0 * (i0 + i2 - i1), guard)
                      / jnp.maximum(mass, guard)) / 2.0
        bz = jnp.sqrt(jnp.maximum(6.0 * (i0 + i1 - i2), guard)
                      / jnp.maximum(mass, guard)) / 2.0
        box = jnp.stack([bx, by, bz]) * 2.0  # full dimensions

        # 6D velocity of body i at CoM, in inertial(-aligned local) frame
        imat = d.ximat[i]
        # spatial velocity at body CoM (world axes):
        vel6 = mx.transform_motion(d.cvel[i],
                                   d.xipos[i] - d.subtree_com[m.body_rootid[i]])
        w_world, v_world = vel6[:3], vel6[3:]
        v_world = v_world - m.opt.wind
        lw = imat.T @ w_world
        lv = imat.T @ v_world

        lfrc_t = jnp.zeros(3, dtype)
        lfrc_f = jnp.zeros(3, dtype)

        # viscous resistance (equivalent sphere)
        diam = (box[0] + box[1] + box[2]) / 3.0
        lfrc_t = lfrc_t - jnp.pi * diam ** 3 * m.opt.viscosity * lw
        lfrc_f = lfrc_f - 3.0 * jnp.pi * diam * m.opt.viscosity * lv

        # quadratic drag (density)
        rho = m.opt.density
        # torque: - rho * box_j * (box_k^4 + box_l^4) * |w_j| * w_j / 64
        for jax_i, (j, k, l) in enumerate([(0, 1, 2), (1, 0, 2), (2, 0, 1)]):
            tq = -rho * box[j] * (box[k] ** 4 + box[l] ** 4) / 64.0 \
                * jnp.abs(lw[j]) * lw[j]
            lfrc_t = lfrc_t.at[j].add(tq)
            fr = -0.5 * rho * box[k] * box[l] * jnp.abs(lv[j]) * lv[j]
            lfrc_f = lfrc_f.at[j].add(fr)

        # rotate to world, apply at body CoM
        frc_t = imat @ lfrc_t
        frc_f = imat @ lfrc_f
        qfrc = qfrc + _apply_ft(m, d, frc_f, frc_t, d.xipos[i], i)
    return qfrc


def _apply_ft(m: Model, d: Data, force, torque, point, bodyid):
    """mj_applyFT: maps a world-frame wrench at ``point`` on ``bodyid`` to
    generalized forces via the body chain jacobian."""
    from dm_control_tpu.physics import kinematics as kin

    jacp, jacr = kin.jac(m, d, point, bodyid)
    return jacp.T @ force + jacr.T @ torque


def xfrc_accumulate(m: Model, d: Data):
    """Projects user-applied Cartesian wrenches (xfrc_applied) to qfrc."""
    dtype = d.qpos.dtype
    qfrc = jnp.zeros(m.nv, dtype)
    for i in range(1, m.nbody):
        qfrc = qfrc + _apply_ft(
            m, d, d.xfrc_applied[i, :3], d.xfrc_applied[i, 3:], d.xipos[i], i)
    return qfrc
