"""Sensor evaluation (mj_sensorPos/Vel/Acc analogue).

Covers the sensor types the reference suite models declare (touch, IMU,
joint/tendon state, frame poses/velocities, subtree quantities,
force/torque, rangefinder).  Sensors are evaluated into the flat
``sensordata`` vector with statically-known addresses.
"""

from __future__ import annotations

import jax.numpy as jnp

from dm_control_tpu.physics import mathx as mx
from dm_control_tpu.physics.model import (
    Data, JointType, Model, ObjType, SensorType,
)

_S = SensorType


def _obj_pos(m, d, objtype, objid):
    if objtype == int(ObjType.SITE):
        return d.site_xpos[objid]
    if objtype in (int(ObjType.BODY), int(ObjType.XBODY)):
        return d.xpos[objid]
    if objtype == int(ObjType.GEOM):
        return d.geom_xpos[objid]
    raise NotImplementedError(f"frame objtype {objtype}")


def _obj_mat(m, d, objtype, objid):
    if objtype == int(ObjType.SITE):
        return d.site_xmat[objid]
    if objtype in (int(ObjType.BODY), int(ObjType.XBODY)):
        return d.xmat[objid]
    if objtype == int(ObjType.GEOM):
        return d.geom_xmat[objid]
    raise NotImplementedError(f"frame objtype {objtype}")


def _obj_bodyid(m, d, objtype, objid):
    if objtype == int(ObjType.SITE):
        return m.site_bodyid[objid]
    if objtype in (int(ObjType.BODY), int(ObjType.XBODY)):
        return objid
    if objtype == int(ObjType.GEOM):
        return m.geom_bodyid[objid]
    raise NotImplementedError(f"frame objtype {objtype}")


def _point_vel(m: Model, d: Data, point, bodyid, local_frame_mat=None):
    """6D [ang, lin] velocity of a body-fixed point, world (or local) axes."""
    root = m.body_rootid[bodyid]
    vel = mx.transform_motion(d.cvel[bodyid], point - d.subtree_com[root])
    if local_frame_mat is not None:
        ang = local_frame_mat.T @ vel[:3]
        lin = local_frame_mat.T @ vel[3:]
        return jnp.concatenate([ang, lin])
    return vel


def sensor_pos(m: Model, d: Data) -> Data:
    if m.nsensor == 0:
        return d
    out = d.sensordata
    for s in range(m.nsensor):
        stype = _S(m.sensor_type[s])
        adr, objid, objtype = (m.sensor_adr[s], m.sensor_objid[s],
                               m.sensor_objtype[s])
        if stype == _S.JOINTPOS:
            out = out.at[adr].set(d.qpos[m.jnt_qposadr[objid]])
        elif stype == _S.BALLQUAT:
            a = m.jnt_qposadr[objid]
            out = out.at[adr:adr + 4].set(
                mx.quat_normalize(d.qpos[a:a + 4]))
        elif stype == _S.TENDONPOS:
            out = out.at[adr].set(d.ten_length[objid])
        elif stype == _S.ACTUATORPOS:
            out = out.at[adr].set(d.actuator_length[objid])
        elif stype == _S.FRAMEPOS:
            out = out.at[adr:adr + 3].set(_obj_pos(m, d, objtype, objid))
        elif stype == _S.FRAMEQUAT:
            mat = _obj_mat(m, d, objtype, objid)
            out = out.at[adr:adr + 4].set(mx.mat_to_quat(mat))
        elif stype in (_S.FRAMEXAXIS, _S.FRAMEYAXIS, _S.FRAMEZAXIS):
            col = {_S.FRAMEXAXIS: 0, _S.FRAMEYAXIS: 1, _S.FRAMEZAXIS: 2}[stype]
            out = out.at[adr:adr + 3].set(
                _obj_mat(m, d, objtype, objid)[:, col])
        elif stype == _S.SUBTREECOM:
            out = out.at[adr:adr + 3].set(d.subtree_com[objid])
        elif stype == _S.MAGNETOMETER:
            out = out.at[adr:adr + 3].set(
                d.site_xmat[objid].T @ m.opt.magnetic)
        elif stype == _S.RANGEFINDER:
            out = out.at[adr].set(_rangefinder(m, d, objid))
        else:
            pass  # velocity/acceleration sensors handled in later stages
    return d.replace(sensordata=out)


def sensor_vel(m: Model, d: Data) -> Data:
    if m.nsensor == 0:
        return d
    out = d.sensordata
    subtree_linvel = None
    subtree_angmom = None
    for s in range(m.nsensor):
        stype = _S(m.sensor_type[s])
        adr, objid, objtype = (m.sensor_adr[s], m.sensor_objid[s],
                               m.sensor_objtype[s])
        if stype == _S.JOINTVEL:
            out = out.at[adr].set(d.qvel[m.jnt_dofadr[objid]])
        elif stype == _S.BALLANGVEL:
            a = m.jnt_dofadr[objid]
            out = out.at[adr:adr + 3].set(d.qvel[a:a + 3])
        elif stype == _S.TENDONVEL:
            out = out.at[adr].set(d.ten_velocity[objid])
        elif stype == _S.ACTUATORVEL:
            out = out.at[adr].set(d.actuator_velocity[objid])
        elif stype == _S.GYRO:
            b = m.site_bodyid[objid]
            vel = _point_vel(m, d, d.site_xpos[objid], b, d.site_xmat[objid])
            out = out.at[adr:adr + 3].set(vel[:3])
        elif stype == _S.VELOCIMETER:
            b = m.site_bodyid[objid]
            vel = _point_vel(m, d, d.site_xpos[objid], b, d.site_xmat[objid])
            out = out.at[adr:adr + 3].set(vel[3:])
        elif stype in (_S.FRAMELINVEL, _S.FRAMEANGVEL):
            b = _obj_bodyid(m, d, objtype, objid)
            p = _obj_pos(m, d, objtype, objid)
            vel = _point_vel(m, d, p, b)
            part = vel[3:] if stype == _S.FRAMELINVEL else vel[:3]
            out = out.at[adr:adr + 3].set(part)
        elif stype == _S.SUBTREELINVEL:
            if subtree_linvel is None:
                subtree_linvel, subtree_angmom = _subtree_vel(m, d)
            out = out.at[adr:adr + 3].set(subtree_linvel[objid])
        elif stype == _S.SUBTREEANGMOM:
            if subtree_angmom is None:
                subtree_linvel, subtree_angmom = _subtree_vel(m, d)
            out = out.at[adr:adr + 3].set(subtree_angmom[objid])
    return d.replace(sensordata=out)


def sensor_acc(m: Model, d: Data) -> Data:
    """Acceleration/force-dependent sensors; needs post-constraint qacc."""
    if m.nsensor == 0:
        return d
    needs = any(_S(m.sensor_type[s]) in
                (_S.TOUCH, _S.ACCELEROMETER, _S.FORCE, _S.TORQUE,
                 _S.FRAMELINACC, _S.FRAMEANGACC)
                for s in range(m.nsensor))
    if not needs:
        return d
    cacc, cfrc_int = _rne_postconstraint(m, d)
    out = d.sensordata
    touch_vals = _touch_all(m, d)
    for s in range(m.nsensor):
        stype = _S(m.sensor_type[s])
        adr, objid = m.sensor_adr[s], m.sensor_objid[s]
        if stype == _S.TOUCH:
            out = out.at[adr].set(touch_vals[s])
        elif stype == _S.ACCELEROMETER:
            b = m.site_bodyid[objid]
            root = m.body_rootid[b]
            offset = d.site_xpos[objid] - d.subtree_com[root]
            acc6 = mx.transform_motion(cacc[b], offset)
            vel6 = mx.transform_motion(d.cvel[b], offset)
            # add centripetal term: a_point = acc_lin + w x v_lin
            lin = acc6[3:] + jnp.cross(vel6[:3], vel6[3:])
            out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ lin)
        elif stype in (_S.FRAMELINACC, _S.FRAMEANGACC):
            objtype = m.sensor_objtype[s]
            b = _obj_bodyid(m, d, objtype, objid)
            root = m.body_rootid[b]
            p = _obj_pos(m, d, objtype, objid)
            acc6 = mx.transform_motion(cacc[b], p - d.subtree_com[root])
            if stype == _S.FRAMELINACC:
                vel6 = mx.transform_motion(d.cvel[b], p - d.subtree_com[root])
                lin = acc6[3:] + jnp.cross(vel6[:3], vel6[3:])
                # report in world frame, remove the -gravity baseline? MuJoCo
                # framelinacc includes gravity-free true acceleration:
                lin = lin + m.opt.gravity
                out = out.at[adr:adr + 3].set(lin)
            else:
                out = out.at[adr:adr + 3].set(acc6[:3])
        elif stype == _S.FORCE:
            b = m.site_bodyid[objid]
            root = m.body_rootid[b]
            fr = mx.transform_force(
                cfrc_int[b], d.site_xpos[objid] - d.subtree_com[root])
            out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ fr[3:])
        elif stype == _S.TORQUE:
            b = m.site_bodyid[objid]
            root = m.body_rootid[b]
            fr = mx.transform_force(
                cfrc_int[b], d.site_xpos[objid] - d.subtree_com[root])
            out = out.at[adr:adr + 3].set(d.site_xmat[objid].T @ fr[:3])
    return d.replace(sensordata=out)


def _touch_all(m: Model, d: Data):
    """All touch sensors at once: (nsensor,) values (zeros for non-touch).

    Touch = sum of contact normal forces whose position falls inside the
    site volume and whose contact involves the site's body — computed as
    one (sensors × contacts) batch instead of nested unrolled loops.
    """
    import numpy as np

    dtype = d.qpos.dtype
    vals = jnp.zeros(m.nsensor, dtype)
    touch_ids = [s for s in range(m.nsensor)
                 if _S(m.sensor_type[s]) == _S.TOUCH]
    con = d.contact
    ncon = len(con.dim)
    if not touch_ids or ncon == 0:
        return vals
    sids = np.array([m.sensor_objid[s] for s in touch_ids])
    sbodies = np.array([m.site_bodyid[i] for i in sids])
    cb1 = np.array([m.geom_bodyid[g] for g in con.geom1])
    cb2 = np.array([m.geom_bodyid[g] for g in con.geom2])
    # (S, C) static mask: contact touches the sensor's body
    body_mask = jnp.asarray((sbodies[:, None] == cb1[None, :])
                            | (sbodies[:, None] == cb2[None, :]))
    # contact pos in each site's local frame: (S, C, 3)
    smat = d.site_xmat[sids]  # (S, 3, 3)
    spos = d.site_xpos[sids]  # (S, 3)
    rel = con.pos[None, :, :] - spos[:, None, :]
    p = jnp.einsum("sij,sci->scj", smat, rel)
    size = m.site_size[sids][:, None, :]  # (S, 1, 3)
    stypes = np.array([m.site_type[i] for i in sids])[:, None]

    sphere = jnp.sum(p * p, -1) <= size[..., 0] ** 2
    z = jnp.clip(p[..., 2], -size[..., 1], size[..., 1])
    capsule = (p[..., 0] ** 2 + p[..., 1] ** 2
               + (p[..., 2] - z) ** 2) <= size[..., 0] ** 2
    ellipsoid = jnp.sum((p / jnp.maximum(size, 1e-15)) ** 2, -1) <= 1.0
    cylinder = ((p[..., 0] ** 2 + p[..., 1] ** 2 <= size[..., 0] ** 2)
                & (jnp.abs(p[..., 2]) <= size[..., 1]))
    box = jnp.all(jnp.abs(p) <= size, -1)
    st = jnp.asarray(stypes)
    inside = jnp.select(
        [st == 2, st == 3, st == 4, st == 5],
        [sphere, capsule, ellipsoid, cylinder], box)

    force = jnp.maximum(d.contact_force, 0.0)[None, :]
    totals = jnp.sum(jnp.where(body_mask & inside, force, 0.0), axis=1)
    return vals.at[jnp.asarray(np.array(touch_ids))].set(
        totals.astype(dtype))


def _subtree_vel(m: Model, d: Data):
    """mj_subtreeVel: subtree CoM linear velocity and angular momentum,
    vectorized with a static subtree-membership matrix."""
    import numpy as np

    # body CoM spatial velocities (world), batched
    root = jnp.array(m.body_rootid, jnp.int32)
    vel6 = mx.transform_motion(d.cvel, d.xipos - d.subtree_com[root])
    ang, lin = vel6[:, :3], vel6[:, 3:]
    mom = m.body_mass[:, None] * lin

    # subtree membership: member[b, i] = 1 if body i is in subtree of b
    nb = m.nbody
    member = np.zeros((nb, nb))
    parent = m.body_parentid
    for i in range(nb):
        b = i
        while True:
            member[b, i] = 1.0
            if b == 0:
                break
            b = parent[b]
    member_j = jnp.asarray(member, d.qpos.dtype)

    linvel = (member_j @ mom) / jnp.maximum(
        m.body_subtreemass[:, None], 1e-15)

    # angular momentum about each subtree com:
    # L_b = sum_{i in subtree(b)} I_i w_i + m_i (r_i - com_b) x (v_i - v_b)
    iw = jnp.einsum("bij,bj,bkj,bk->bi", d.ximat, m.body_inertia,
                    d.ximat, ang)
    r = d.xipos[None, :, :] - d.subtree_com[:, None, :]  # (b, i, 3)
    dv = lin[None, :, :] - linvel[:, None, :]  # (b, i, 3)
    cross = jnp.cross(r, dv) * m.body_mass[None, :, None]
    angmom = jnp.einsum("bi,ic->bc", member_j, iw) + jnp.sum(
        member_j[:, :, None] * cross, axis=1)
    return linvel, angmom


def _rne_postconstraint(m: Model, d: Data):
    """mj_rnePostConstraint: cacc / cfrc_int with the final qacc, contact
    and applied forces included."""
    dtype = d.qpos.dtype
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity])
    cacc = [cacc0]
    for i in range(1, m.nbody):
        p = m.body_parentid[i]
        a = cacc[p]
        adr, num = m.body_dofadr[i], m.body_dofnum[i]
        if num:
            a = (a + d.cdof_dot[adr:adr + num].T @ d.qvel[adr:adr + num]
                 + d.cdof[adr:adr + num].T @ d.qacc[adr:adr + num])
        cacc.append(a)
    cacc = jnp.stack(cacc)

    # body forces: f_i = I a + v x* I v  minus external (contact + applied),
    # matching mj_rnePostConstraint's cfrc_int accounting.
    cfrc_body = mx.inert_mul(d.cinert, cacc) + mx.force_cross(
        d.cvel, mx.inert_mul(d.cinert, d.cvel))

    cfrc_ext = _cfrc_ext(m, d)
    acc = [cfrc_body[i] - cfrc_ext[i] for i in range(m.nbody)]
    for level in reversed(m.body_tree_levels):
        for i in level:
            p = m.body_parentid[i]
            acc[p] = acc[p] + acc[i]
    cfrc_int = jnp.stack(acc)
    return cacc, cfrc_int


def _cfrc_ext(m: Model, d: Data):
    """External (contact + xfrc_applied) wrench per body, expressed at the
    subtree com of each body's kinematic root in world axes — the com-based
    frame cfrc_int lives in (mj_rnePostConstraint).  Equality connect/weld
    reaction forces are not yet accounted (none of the suite's sensor-
    bearing models combine them with force sensors)."""
    dtype = d.qpos.dtype
    root_com = d.subtree_com[jnp.asarray(m.body_rootid, jnp.int32)]
    cfrc_ext = jnp.zeros((m.nbody, 6), dtype)

    ncon = len(d.contact.dim)
    if ncon:
        b1 = jnp.asarray([m.geom_bodyid[g] for g in d.contact.geom1])
        b2 = jnp.asarray([m.geom_bodyid[g] for g in d.contact.geom2])
        wrench = d.contact_force_vec  # (ncon, 6) in contact frame
        # world force/torque: frame rows are the axes (normal, t1, t2)
        f_w = jnp.einsum("kij,ki->kj", d.contact.frame, wrench[:, :3])
        t_w = jnp.einsum("kij,ki->kj", d.contact.frame, wrench[:, 3:])
        # spatial force at contact point -> com-based frame of each body:
        # (torque, force) with torque shifted by (pos - com) x force
        for sign, bs in ((1.0, b2), (-1.0, b1)):
            offset = d.contact.pos - root_com[bs]  # (ncon, 3)
            trq = sign * (t_w + jnp.cross(offset, f_w))
            frc = sign * f_w
            sp = jnp.concatenate([trq, frc], axis=-1)  # (ncon, 6)
            cfrc_ext = cfrc_ext.at[bs].add(sp)

    # xfrc_applied: [force(3), torque(3)] at xipos, world axes
    off = d.xipos - root_com
    trq = d.xfrc_applied[:, 3:] + jnp.cross(off, d.xfrc_applied[:, :3])
    cfrc_ext = cfrc_ext + jnp.concatenate(
        [trq, d.xfrc_applied[:, :3]], axis=-1)
    return cfrc_ext


def _rangefinder(m: Model, d: Data, siteid: int):
    """Ray-cast along the site's +z axis against geoms (plane/sphere subset).

    Returns -1 when nothing is hit (MuJoCo convention)."""
    dtype = d.qpos.dtype
    origin = d.site_xpos[siteid]
    direction = d.site_xmat[siteid][:, 2]
    best = jnp.asarray(jnp.inf, dtype)
    from dm_control_tpu.physics.model import GeomType

    site_body = m.site_bodyid[siteid]
    for g in range(m.ngeom):
        if m.geom_bodyid[g] == site_body:
            continue
        gtype = GeomType(m.geom_type[g])
        if gtype == GeomType.PLANE:
            n = d.geom_xmat[g][:, 2]
            denom = jnp.dot(n, direction)
            t = jnp.dot(n, d.geom_xpos[g] - origin) / jnp.where(
                jnp.abs(denom) < 1e-12, jnp.inf, denom)
            t = jnp.where(t > 0, t, jnp.inf)
            best = jnp.minimum(best, t)
        elif gtype == GeomType.SPHERE:
            oc = origin - d.geom_xpos[g]
            b = jnp.dot(oc, direction)
            c = jnp.dot(oc, oc) - m.geom_size[g, 0] ** 2
            disc = b * b - c
            t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            t = jnp.where((disc > 0) & (t > 0), t, jnp.inf)
            best = jnp.minimum(best, t)
        # other geom types: skipped (extend as tasks need them)
    return jnp.where(jnp.isinf(best), -1.0, best)
