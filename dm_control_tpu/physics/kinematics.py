"""Forward kinematics and related position-stage quantities.

Implements the position stage of the pipeline that the reference reaches
through mj_step1/mj_forward (called at dm_control/mujoco/engine.py:161-166):
body/geom/site frames, subtree centers of mass, CoM-centered motion
subspaces (cdof), point jacobians, and tendon lengths/moments.

The body tree structure is static, so all loops below unroll at trace time
into batched array ops; the batch (env) dimension supplies the
vectorization.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics.model import Data, JointType, Model, WrapType


def _fk_structure(m: Model):
    """Static FK schedule: per tree level, the body list and, per joint
    slot within the level, per-type index groups.

    Each entry: (bodies, parents, slots) where slots is a list (one per
    joint position within a body) of dicts type -> (level_rows, jids).
    """
    levels = []
    for level in m.body_tree_levels:
        bodies = list(level)
        parents = [m.body_parentid[b] for b in bodies]
        max_j = max((m.body_jntnum[b] for b in bodies), default=0)
        slots = []
        for k in range(max_j):
            groups = {}
            for row, b in enumerate(bodies):
                if m.body_jntnum[b] > k:
                    jid = m.body_jntadr[b] + k
                    groups.setdefault(m.jnt_type[jid], ([], []))
                    groups[m.jnt_type[jid]][0].append(row)
                    groups[m.jnt_type[jid]][1].append(jid)
            slots.append(groups)
        levels.append((bodies, parents, slots))
    return levels


def kinematics(m: Model, d: Data) -> Data:
    """mj_kinematics: computes xpos/xquat/xmat, geom/site frames.

    Level-vectorized: all bodies of a tree level advance together, and
    joints are applied in batched per-type groups — the op count scales
    with tree depth, not body count."""
    qpos = d.qpos
    dtype = qpos.dtype
    xpos = jnp.zeros((m.nbody, 3), dtype)
    xquat = jnp.zeros((m.nbody, 4), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((m.njnt, 3), dtype)
    xaxis = jnp.zeros((m.njnt, 3), dtype)

    for bodies, parents, slots in _fk_structure(m):
        bidx = jnp.asarray(bodies)
        pidx = jnp.asarray(parents)
        pq = xquat[pidx]
        pos = xpos[pidx] + mx.rotate(m.body_pos[bidx], pq)
        quat = mx.quat_mul(pq, m.body_quat[bidx])
        for groups in slots:
            for jtype, (rows, jids) in groups.items():
                r = jnp.asarray(rows)
                j = jnp.asarray(jids)
                qadr = jnp.asarray([m.jnt_qposadr[x] for x in jids])
                jpos = m.jnt_pos[j]
                jaxn = m.jnt_axis[j]
                qsel = quat[r]
                psel = pos[r]
                if jtype == int(JointType.FREE):
                    newp = qpos[qadr[:, None] + jnp.arange(3)]
                    newq = mx.quat_normalize(
                        qpos[qadr[:, None] + 3 + jnp.arange(4)])
                    anchor = newp
                elif jtype == int(JointType.BALL):
                    anchor = psel + mx.rotate(jpos, qsel)
                    qloc = mx.quat_normalize(
                        qpos[qadr[:, None] + jnp.arange(4)])
                    newq = mx.quat_mul(qsel, qloc)
                    newp = anchor - mx.rotate(jpos, newq)
                elif jtype == int(JointType.SLIDE):
                    axis_w = mx.rotate(jaxn, qsel)
                    newp = psel + axis_w * (qpos[qadr]
                                            - m.qpos0[qadr])[:, None]
                    newq = qsel
                    anchor = newp + mx.rotate(jpos, qsel)
                else:  # HINGE
                    anchor = psel + mx.rotate(jpos, qsel)
                    angle = qpos[qadr] - m.qpos0[qadr]
                    qloc = mx.axis_angle_to_quat(jaxn, angle)
                    newq = mx.quat_mul(qsel, qloc)
                    newp = anchor - mx.rotate(jpos, newq)
                pos = pos.at[r].set(newp)
                quat = quat.at[r].set(newq)
                xanchor = xanchor.at[j].set(anchor)
                xaxis = xaxis.at[j].set(mx.rotate(jaxn, newq)
                                        if jtype != int(JointType.SLIDE)
                                        else mx.rotate(jaxn, qsel))
                pos, quat, xanchor, xaxis = jax.lax.optimization_barrier(
                    (pos, quat, xanchor, xaxis))
        xpos = xpos.at[bidx].set(pos)
        xquat = xquat.at[bidx].set(quat)
        # materialize the level's frames: in large fused programs
        # (humanoid_CMU, dog) XLA:CPU has been observed to miscompile the
        # cross-level gather/scatter chains (xpos off by 1e-2 from
        # identical qpos, deterministic per compile, eager always correct);
        # the barrier pins each level boundary and costs only a buffer
        xpos, xquat = jax.lax.optimization_barrier((xpos, xquat))
    xmat = mx.quat_to_mat(xquat)

    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, m.body_ipos)
    ximat = xmat @ mx.quat_to_mat(m.body_iquat)

    gb = jnp.array(m.geom_bodyid, jnp.int32)
    geom_xpos = xpos[gb] + jnp.einsum("gij,gj->gi", xmat[gb], m.geom_pos)
    geom_xmat = xmat[gb] @ mx.quat_to_mat(m.geom_quat)

    sb = jnp.array(m.site_bodyid, jnp.int32)
    site_xpos = xpos[sb] + jnp.einsum("sij,sj->si", xmat[sb], m.site_pos)
    site_xmat = xmat[sb] @ mx.quat_to_mat(m.site_quat)

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
        site_xpos=site_xpos, site_xmat=site_xmat,
        jnt_xanchor=xanchor, jnt_xaxis=xaxis,
    )


def com_pos(m: Model, d: Data) -> Data:
    """mj_comPos: subtree CoM, CoM-centered body inertias and dof subspaces."""
    dtype = d.qpos.dtype
    # subtree com: subtree sum of mass-weighted ipos (mask matmul on the
    # f32 path; MuJoCo accumulation order on the f64 parity path)
    mass = m.body_mass[:, None]
    if dtype == jnp.float32 and m.nbody > 4:
        from dm_control_tpu.physics.model import body_subtree_mask

        wsum = jnp.asarray(body_subtree_mask(m), dtype) \
            @ (jnp.asarray(mass, dtype) * d.xipos)
    else:
        weighted = [mass[i] * d.xipos[i] for i in range(m.nbody)]
        acc = list(weighted)
        for levels in reversed(m.body_tree_levels):
            for i in levels:
                p = m.body_parentid[i]
                acc[p] = acc[p] + acc[i]
        wsum = jnp.stack(acc)
    subtree_com = wsum / jnp.maximum(
        m.body_subtreemass[:, None], 1e-15)

    # cinert: body spatial inertia about the root subtree com, world axes
    rootx = subtree_com[jnp.array(m.body_rootid, jnp.int32)]
    offset = d.xipos - rootx  # com of body relative to root-com frame origin
    cinert = mx.inert_from_body(m.body_mass, m.body_inertia, offset, d.ximat)

    # cdof
    cdofs = []
    for jid in range(m.njnt):
        jtype = JointType(m.jnt_type[jid])
        bodyid = m.jnt_bodyid[jid]
        com = subtree_com[m.body_rootid[bodyid]]
        anchor = d.jnt_xanchor[jid]
        if jtype == JointType.FREE:
            for k in range(3):
                e = jnp.zeros(6, dtype).at[3 + k].set(1.0)
                cdofs.append(e)
            frame = d.xmat[bodyid]  # columns = body axes in world
            for k in range(3):
                ax = frame[:, k]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, com - anchor)]))
        elif jtype == JointType.BALL:
            frame = d.xmat[bodyid]
            for k in range(3):
                ax = frame[:, k]
                cdofs.append(jnp.concatenate([ax, jnp.cross(ax, com - anchor)]))
        elif jtype == JointType.SLIDE:
            ax = d.jnt_xaxis[jid]
            cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), ax]))
        else:  # HINGE
            ax = d.jnt_xaxis[jid]
            cdofs.append(jnp.concatenate([ax, jnp.cross(ax, com - anchor)]))
    cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype)

    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: Model, d: Data) -> Data:
    """mj_comVel: body spatial velocities and cdof time-derivatives.

    f32 throughput path: the per-body sequential sweep is replaced by two
    static-mask matmuls — cvel[b] = sum of cdof_j qvel_j over b's chain
    dofs, and cdof_dot[k] = vel_before(k) x cdof[k] where vel_before(k)
    (the partial velocity MuJoCo has accumulated when it reaches dof k)
    is a strictly-before dof mask product.  The f64 parity path keeps
    MuJoCo's accumulation order bit-for-bit.
    """
    dtype = d.qpos.dtype
    if dtype == jnp.float32 and m.nbody > 4 and m.nv:
        from dm_control_tpu.physics.model import dof_before_mask

        per_dof = d.cdof * d.qvel[:, None]  # (nv, 6)
        cvel = jnp.asarray(m.body_chain_mask, dtype) @ per_dof
        before, rotflag = dof_before_mask(m)
        vel_before = jnp.asarray(before, dtype) @ per_dof  # (nv, 6)
        cdof_dot = mx.motion_cross(vel_before, d.cdof) \
            * jnp.asarray(rotflag, dtype)[:, None]
        return d.replace(cvel=cvel, cdof_dot=cdof_dot)
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv
    for i in range(1, m.nbody):
        p = m.body_parentid[i]
        vel = cvel[p]
        jadr, jnum = m.body_jntadr[i], m.body_jntnum[i]
        for jid in range(jadr, jadr + jnum):
            jtype = JointType(m.jnt_type[jid])
            dadr = m.jnt_dofadr[jid]
            if jtype == JointType.FREE:
                # translation dofs: constant world axes, cdofdot = 0
                for k in range(3):
                    cdof_dot[dadr + k] = jnp.zeros(6, dtype)
                vel = vel + d.cdof[dadr:dadr + 3].T @ d.qvel[dadr:dadr + 3]
                # rotation dofs: like ball, using velocity incl. translations
                for k in range(3, 6):
                    cdof_dot[dadr + k] = mx.motion_cross(vel, d.cdof[dadr + k])
                vel = vel + d.cdof[dadr + 3:dadr + 6].T @ d.qvel[dadr + 3:dadr + 6]
            elif jtype == JointType.BALL:
                for k in range(3):
                    cdof_dot[dadr + k] = mx.motion_cross(vel, d.cdof[dadr + k])
                vel = vel + d.cdof[dadr:dadr + 3].T @ d.qvel[dadr:dadr + 3]
            else:
                cdof_dot[dadr] = mx.motion_cross(vel, d.cdof[dadr])
                vel = vel + d.cdof[dadr] * d.qvel[dadr]
        cvel.append(vel)
    cvel = jnp.stack(cvel)
    cdof_dot = (jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype))
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# Jacobians.
# ---------------------------------------------------------------------------


def _body_dof_chain(m: Model, bodyid: int) -> Tuple[int, ...]:
    """Static list of dofs affecting ``bodyid`` (ancestors incl. self)."""
    dofs = []
    b = bodyid
    while b != 0:
        adr, num = m.body_dofadr[b], m.body_dofnum[b]
        if num > 0:
            dofs.extend(range(adr, adr + num))
        b = m.body_parentid[b]
    return tuple(sorted(dofs))


def jac(m: Model, d: Data, point, bodyid: int):
    """mj_jac: translational and rotational jacobians of a world point on a
    body.  Returns (jacp, jacr), each (3, nv)."""
    dtype = d.qpos.dtype
    jacp = jnp.zeros((3, m.nv), dtype)
    jacr = jnp.zeros((3, m.nv), dtype)
    chain = _body_dof_chain(m, bodyid)
    if not chain:
        return jacp, jacr
    com = d.subtree_com[m.body_rootid[bodyid]]
    offset = point - com
    idx = jnp.array(chain, jnp.int32)
    cd = d.cdof[idx]  # (k, 6)
    jp = cd[:, 3:] + jnp.cross(cd[:, :3], jnp.broadcast_to(offset, cd[:, :3].shape))
    jacp = jacp.at[:, idx].set(jp.T)
    jacr = jacr.at[:, idx].set(cd[:, :3].T)
    return jacp, jacr


def jac_site(m: Model, d: Data, siteid: int):
    return jac(m, d, d.site_xpos[siteid], m.site_bodyid[siteid])


def jac_points(m: Model, d: Data, points, bodyids):
    """Vectorized mj_jac over K points: returns (jacp, jacr), each
    (K, 3, nv).

    ``bodyids`` is a static tuple (or a traced int array — used by the
    contact-compaction path, where WHICH bodies collide is decided per
    environment by top-k depth selection); chain masking uses the
    precomputed body_chain_mask so the whole computation is a handful of
    batched ops instead of K unrolled jacobian builds.
    """
    if isinstance(bodyids, (tuple, list)):
        bid = jnp.array(bodyids, jnp.int32)
        root = jnp.array([m.body_rootid[b] for b in bodyids], jnp.int32)
    else:
        bid = bodyids
        root = jnp.asarray(m.body_rootid, jnp.int32)[bid]
    mask = m.body_chain_mask[bid]  # (K, nv)
    com = d.subtree_com[root]  # (K, 3)
    offset = points[:, None, :] - com[:, None, :]  # (K, 1, 3)
    ang = d.cdof[None, :, :3]  # (1, nv, 3)
    lin = d.cdof[None, :, 3:]  # (1, nv, 3)
    jacp = (lin + jnp.cross(ang, jnp.broadcast_to(
        offset, (offset.shape[0], ang.shape[1], 3)))) * mask[..., None]
    jacr = jnp.broadcast_to(ang, jacp.shape) * mask[..., None]
    # (K, nv, 3) → (K, 3, nv)
    return jacp.swapaxes(1, 2), jacr.swapaxes(1, 2)


# ---------------------------------------------------------------------------
# Tendons.
# ---------------------------------------------------------------------------


def tendon(m: Model, d: Data) -> Data:
    """mj_tendon: lengths and moment arms of fixed and spatial tendons."""
    if m.ntendon == 0:
        return d
    dtype = d.qpos.dtype
    lengths = []
    moments = []
    for t in range(m.ntendon):
        adr, num = m.tendon_adr[t], m.tendon_num[t]
        wtypes = m.wrap_type[adr:adr + num]
        if all(w == int(WrapType.JOINT) for w in wtypes):
            ln = jnp.zeros((), dtype)
            mom = jnp.zeros(m.nv, dtype)
            for k in range(adr, adr + num):
                jid = m.wrap_objid[k]
                coef = m.wrap_prm[k]
                qadr = m.jnt_qposadr[jid]
                dadr = m.jnt_dofadr[jid]
                ln = ln + coef * d.qpos[qadr]
                mom = mom.at[dadr].add(coef)
            lengths.append(ln)
            moments.append(mom)
        else:
            # spatial: straight segments between consecutive sites
            sites = [m.wrap_objid[k] for k in range(adr, adr + num)]
            ln = jnp.zeros((), dtype)
            mom = jnp.zeros(m.nv, dtype)
            for s0, s1 in zip(sites[:-1], sites[1:]):
                p0, p1 = d.site_xpos[s0], d.site_xpos[s1]
                diff = p1 - p0
                seg = jnp.linalg.norm(diff)
                dirv = diff / jnp.maximum(seg, 1e-15)
                ln = ln + seg
                jacp0, _ = jac_site(m, d, s0)
                jacp1, _ = jac_site(m, d, s1)
                mom = mom + dirv @ (jacp1 - jacp0)
            lengths.append(ln)
            moments.append(mom)
    ten_length = jnp.stack(lengths)
    ten_moment = jnp.stack(moments)
    return d.replace(ten_length=ten_length, ten_moment=ten_moment)
