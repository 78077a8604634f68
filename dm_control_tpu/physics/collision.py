"""Collision detection: static broadphase + primitive narrowphase.

The candidate pair list is computed at compile time from contype/conaffinity
masks, weld/parent filters and <contact><exclude> (mirroring mj_collision's
filtering) and stored on the Model; at trace time each pair dispatches to a
type-pair narrowphase returning a *fixed* number of contact rows.  Inactive
rows (dist > includemargin) stay in the arrays and produce zero force in the
solver — no dynamic shapes anywhere.

Geom frames: ``pos`` world position, ``mat`` world-from-geom rotation.
Contact normals point from geom1 into geom2 (MuJoCo convention); the frame
rows are [normal, tangent1, tangent2].
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from dm_control_tpu.physics.model import (
    Contact, Data, DisableBit, GeomType, Model,
)

_MINVAL = 1e-15


def pair_static_info(m):
    """Static per-pair info: (g1, g2, fn, nrows, condim) for supported
    pairs, in collision_pairs order."""
    out = []
    for g1, g2 in m.collision_pairs:
        key = (GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2]))
        if key not in _DISPATCH:
            raise NotImplementedError(
                f"collision {key[0].name}-{key[1].name} "
                f"(geoms {g1},{g2}) not supported yet")
        fn, nrows = _DISPATCH[key]
        p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
        if p1 != p2:
            condim = m.geom_condim[g1 if p1 > p2 else g2]
        else:
            condim = max(m.geom_condim[g1], m.geom_condim[g2])
        out.append((g1, g2, fn, nrows, int(condim)))
    return out


def empty_contact(m, dtype) -> Contact:
    """A contact pytree with the model's static row structure, all rows
    inactive (dist = +inf) — keeps Data structure constant across steps."""
    dims, g1s, g2s = [], [], []
    contact_off = bool(m.opt and (m.opt.disableflags & DisableBit.CONTACT))
    if not contact_off:
        for g1, g2, fn, nrows, condim in pair_static_info(m):
            for _ in range(nrows):
                dims.append(condim)
                g1s.append(g1)
                g2s.append(g2)
    n = len(dims)
    z = jnp.zeros
    eye = jnp.tile(jnp.eye(3, dtype=dtype), (n, 1, 1))
    return Contact(
        dist=jnp.full((n,), jnp.inf, dtype=dtype),
        pos=z((n, 3), dtype=dtype),
        frame=eye if n else z((n, 3, 3), dtype=dtype),
        includemargin=z(n, dtype=dtype),
        friction=jnp.ones((n, 5), dtype=dtype),
        solref=(jnp.tile(jnp.array([0.02, 1.0], dtype), (n, 1)) if n
                else z((n, 2), dtype=dtype)),
        solimp=(jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                         (n, 1)) if n else z((n, 5), dtype=dtype)),
        dim=tuple(dims), geom1=tuple(g1s), geom2=tuple(g2s),
    )


def _make_frame(normal):
    """Builds [n, t1, t2] rows from a unit normal, matching mju_makeFrame:
    helper = (0,1,0) if |n_y| < 0.5 else (0,0,1); t1 = normalize(helper -
    n (n·helper)); t2 = n × t1.  Pyramidal friction forces depend on the
    tangent orientation, so this must match MuJoCo exactly for parity."""
    n = normal
    a = jnp.where(jnp.abs(n[1]) < 0.5,
                  jnp.array([0.0, 1.0, 0.0], n.dtype),
                  jnp.array([0.0, 0.0, 1.0], n.dtype))
    t1 = a - n * jnp.dot(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), _MINVAL)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


# ---------------------------------------------------------------------------
# Narrowphase primitives.  Each returns a list of (dist, pos, normal).
# ---------------------------------------------------------------------------


def plane_sphere(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    r = s2[0]
    h = jnp.dot(n, p2 - p1)
    dist = h - r
    pos = p2 - n * (r + 0.5 * dist)
    return [(dist, pos, n)]


def plane_capsule(p1, m1, s1, p2, m2, s2):
    """Two cap contacts; tangent1 is the capsule axis projected onto the
    plane (mjc_PlaneCapsule's frame convention — pyramidal friction parity
    depends on it)."""
    n = m1[:, 2]
    r, hl = s2[0], s2[1]
    axis = m2[:, 2]
    t1 = axis - n * jnp.dot(n, axis)
    t1n = jnp.linalg.norm(t1)
    # fallback to makeFrame's tangent when the capsule is plane-normal
    fallback = _make_frame(n)[1]
    t1 = jnp.where(t1n < 1e-10, fallback, t1 / jnp.maximum(t1n, _MINVAL))
    frame = jnp.stack([n, t1, jnp.cross(n, t1)])
    out = []
    for sgn in (1.0, -1.0):
        c = p2 + sgn * hl * axis
        h = jnp.dot(n, c - p1)
        dist = h - r
        pos = c - n * (r + 0.5 * dist)
        out.append((dist, pos, frame))
    return out


def plane_cylinder(p1, m1, s1, p2, m2, s2):
    """Up to 4 rim contacts: deepest rim point of each cap ± an offset pair.

    Approximates mjc_PlaneCylinder: supports both resting-on-side (two cap
    contacts) and resting-on-cap (three spread contacts per cap).
    """
    n = m1[:, 2]
    r, hl = s2[0], s2[1]
    axis = m2[:, 2]
    # radial direction of steepest descent along -n, in the cap plane
    proj = n - axis * jnp.dot(n, axis)
    pn = jnp.linalg.norm(proj)
    radial = -proj / jnp.maximum(pn, _MINVAL)
    # when axis ~ parallel to n, radial is arbitrary: use cylinder x-axis
    radial = jnp.where(pn < 1e-8, m2[:, 0], radial)
    out = []
    for sgn in (1.0, -1.0):
        c = p2 + sgn * hl * axis
        deep = c + r * radial
        h = jnp.dot(n, deep - p1)
        out.append((h, deep - n * 0.5 * h, n))
    # two extra spread points on the lower cap for cap-resting stability
    t = jnp.cross(axis, radial)
    lower = jnp.where(jnp.dot(n, axis) < 0, 1.0, -1.0)
    c = p2 + lower * hl * axis
    for ang in (0.5, -0.5):
        pnt = c + r * (radial * jnp.cos(2.0944) + t * jnp.sin(2.0944) * ang * 2)
        h = jnp.dot(n, pnt - p1)
        out.append((h, pnt - n * 0.5 * h, n))
    return out


def plane_ellipsoid(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    nloc = m2.T @ n
    denom = jnp.sqrt(jnp.sum((s2 * nloc) ** 2))
    sp_loc = -(s2 ** 2) * nloc / jnp.maximum(denom, _MINVAL)
    sp = p2 + m2 @ sp_loc
    h = jnp.dot(n, sp - p1)
    return [(h, sp - n * 0.5 * h, n)]


def plane_box(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    corners = []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                local = jnp.array([sx, sy, sz]) * s2
                c = p2 + m2 @ local
                h = jnp.dot(n, c - p1)
                corners.append((h, c))
    dists = jnp.stack([h for h, _ in corners])
    poss = jnp.stack([c for _, c in corners])
    order = jnp.argsort(dists)
    out = []
    for k in range(4):
        idx = order[k]
        h = dists[idx]
        c = poss[idx]
        out.append((h, c - n * 0.5 * h, n))
    return out


def sphere_sphere(p1, m1, s1, p2, m2, s2):
    diff = p2 - p1
    ln = jnp.linalg.norm(diff)
    n = diff / jnp.maximum(ln, _MINVAL)
    dist = ln - (s1[0] + s2[0])
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return [(dist, pos, n)]


def _closest_on_seg(p, a, b):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), _MINVAL)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t * ab


def sphere_capsule(p1, m1, s1, p2, m2, s2):
    axis = m2[:, 2]
    a, b = p2 - s2[1] * axis, p2 + s2[1] * axis
    c = _closest_on_seg(p1, a, b)
    return _sphere_pair(p1, s1[0], c, s2[0])


def _sphere_pair(c1, r1, c2, r2):
    diff = c2 - c1
    ln = jnp.linalg.norm(diff)
    n = diff / jnp.maximum(ln, _MINVAL)
    dist = ln - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)
    return [(dist, pos, n)]


def capsule_capsule(p1, m1, s1, p2, m2, s2):
    a1 = p1 - s1[1] * m1[:, 2]
    b1 = p1 + s1[1] * m1[:, 2]
    a2 = p2 - s2[1] * m2[:, 2]
    b2 = p2 + s2[1] * m2[:, 2]
    # closest points between segments (standard clamped quadratic)
    d1 = b1 - a1
    d2 = b2 - a2
    r = a1 - a2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > _MINVAL, jnp.clip((b * f - c * e) / jnp.maximum(denom, _MINVAL), 0, 1), 0.0)
    t = (b * s + f) / jnp.maximum(e, _MINVAL)
    s = jnp.where(t < 0, jnp.clip(-c / jnp.maximum(a, _MINVAL), 0, 1), s)
    s = jnp.where(t > 1, jnp.clip((b - c) / jnp.maximum(a, _MINVAL), 0, 1), s)
    t = jnp.clip(t, 0.0, 1.0)
    c1 = a1 + d1 * s
    c2 = a2 + d2 * t
    return _sphere_pair(c1, s1[0], c2, s2[0])


def sphere_box(p1, m1, s1, p2, m2, s2):
    # sphere center in box frame
    c = m2.T @ (p1 - p2)
    clamped = jnp.clip(c, -s2, s2)
    inside = jnp.all(jnp.abs(c) < s2)
    # outside: closest surface point
    diff = c - clamped
    ln = jnp.linalg.norm(diff)
    n_out = diff / jnp.maximum(ln, _MINVAL)
    dist_out = ln - s1[0]
    # inside: push out along the nearest face
    depth = s2 - jnp.abs(c)
    axis = jnp.argmin(depth)
    sign = jnp.sign(c[axis] + 1e-30)
    n_in = jnp.zeros(3, c.dtype).at[axis].set(sign)
    dist_in = -(depth[axis] + s1[0])
    surf_in = c + n_in * depth[axis]
    n_loc = jnp.where(inside, n_in, n_out)
    dist = jnp.where(inside, dist_in, dist_out)
    surf = jnp.where(inside, surf_in, clamped)
    n_world = -(m2 @ n_loc)  # normal from sphere(geom1) into box(geom2)
    pos = p2 + m2 @ surf + n_world * (0.5 * dist + 0.0)
    pos = p2 + m2 @ surf - 0.5 * dist * (m2 @ n_loc)
    return [(dist, pos, n_world)]


def capsule_box(p1, m1, s1, p2, m2, s2):
    """Approximate: sphere-box tests at the two segment ends and the point
    closest to the box center (3 rows)."""
    axis = m1[:, 2]
    a, b = p1 - s1[1] * axis, p1 + s1[1] * axis
    mid = _closest_on_seg(p2, a, b)
    out = []
    for c in (a, b, mid):
        out.extend(sphere_box(c, m1, jnp.array([s1[0], 0, 0]), p2, m2, s2))
    return out


_DISPATCH = {
    (GeomType.PLANE, GeomType.SPHERE): (plane_sphere, 1),
    (GeomType.PLANE, GeomType.CAPSULE): (plane_capsule, 2),
    (GeomType.PLANE, GeomType.CYLINDER): (plane_cylinder, 4),
    (GeomType.PLANE, GeomType.ELLIPSOID): (plane_ellipsoid, 1),
    (GeomType.PLANE, GeomType.BOX): (plane_box, 4),
    (GeomType.SPHERE, GeomType.SPHERE): (sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.BOX): (sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (capsule_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (capsule_box, 3),
}


def supported_pair(t1: int, t2: int) -> bool:
    return (GeomType(t1), GeomType(t2)) in _DISPATCH


def contact_rows(m: Model) -> int:
    """Total contact rows for this model's static pair list."""
    total = 0
    for g1, g2 in m.collision_pairs:
        key = (GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2]))
        if key in _DISPATCH:
            total += _DISPATCH[key][1]
    return total


def _pair_params(m: Model, g1: int, g2: int):
    """mj_contactParam: mixes per-geom contact parameters for a pair."""
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 != p2:
        hi = g1 if p1 > p2 else g2
        condim = m.geom_condim[hi]
        friction = m.geom_friction[hi]
        solref = m.geom_solref[hi]
        solimp = m.geom_solimp[hi]
    else:
        condim = max(m.geom_condim[g1], m.geom_condim[g2])
        friction = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
        # solmix weighting
        s1 = jnp.maximum(m.geom_solmix[g1], _MINVAL)
        s2 = jnp.maximum(m.geom_solmix[g2], _MINVAL)
        w1 = s1 / (s1 + s2)
        w2 = s2 / (s1 + s2)
        sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
        # standard (positive) solref mixes linearly; direct uses min
        solref = jnp.where(
            jnp.logical_and(sr1[0] > 0, sr2[0] > 0),
            w1 * sr1 + w2 * sr2, jnp.minimum(sr1, sr2))
        solimp = w1 * m.geom_solimp[g1] + w2 * m.geom_solimp[g2]
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
    mu = friction
    friction5 = jnp.stack([mu[0], mu[0], mu[1], mu[2], mu[2]])
    return int(condim), friction5, solref, solimp, margin - gap


def collision(m: Model, d: Data) -> Data:
    """Runs narrowphase for every static candidate pair."""
    dtype = d.qpos.dtype
    if m.opt.disableflags & DisableBit.CONTACT:
        return d.replace(contact=empty_contact(m, dtype))
    dists: List = []
    poss: List = []
    frames: List = []
    incmargins: List = []
    frictions: List = []
    solrefs: List = []
    solimps: List = []
    dims: List[int] = []
    geom1s: List[int] = []
    geom2s: List[int] = []

    for g1, g2, fn, nrows, condim in pair_static_info(m):
        _, friction5, solref, solimp, incmargin = _pair_params(m, g1, g2)
        rows = fn(d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
                  d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2])
        for dist, pos, normal in rows:
            dists.append(dist)
            poss.append(pos)
            # colliders may return a full (3,3) frame or just the normal
            frames.append(normal if normal.ndim == 2 else _make_frame(normal))
            incmargins.append(incmargin)
            frictions.append(friction5)
            solrefs.append(solref)
            solimps.append(solimp)
            dims.append(condim)
            geom1s.append(g1)
            geom2s.append(g2)

    if not dists:
        return d.replace(contact=empty_contact(m, dtype))

    contact = Contact(
        dist=jnp.stack(dists), pos=jnp.stack(poss), frame=jnp.stack(frames),
        includemargin=jnp.stack(incmargins), friction=jnp.stack(frictions),
        solref=jnp.stack(solrefs), solimp=jnp.stack(solimps),
        dim=tuple(dims), geom1=tuple(geom1s), geom2=tuple(geom2s),
    )
    return d.replace(contact=contact)
