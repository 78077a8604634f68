"""Collision detection: static broadphase + vectorized primitive narrowphase.

The candidate pair list is computed at compile time from contype/conaffinity
masks, weld/parent filters and <contact><exclude> (mirroring mj_collision's
filtering) and stored on the Model.  At trace time, pairs are *grouped by
type-pair* and each group's narrowphase runs as one vmapped computation over
per-pair geom arrays — a handful of fused kernels instead of one unrolled
sub-graph per pair.  Every collider emits a fixed number of rows; inactive
rows (dist > includemargin) stay in the arrays with zero force in the
solver, so there are no dynamic shapes anywhere.

Geom frames: ``pos`` world position, ``mat`` world-from-geom rotation.
Contact normals point from geom1 into geom2 (MuJoCo convention); the frame
rows are [normal, tangent1, tangent2].
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics.model import (
    Contact, Data, DisableBit, GeomType, Model,
)

_MINVAL = 1e-15


def _make_frame(n):
    """[n, t1, t2] from a unit normal, matching mju_makeFrame: helper =
    (0,1,0) if |n_y| < 0.5 else (0,0,1); t1 = normalize(helper - n(n·h));
    t2 = n × t1.  Pyramidal friction forces depend on the tangent
    orientation, so this must match MuJoCo exactly for parity."""
    a = jnp.where(jnp.abs(n[1]) < 0.5,
                  jnp.array([0.0, 1.0, 0.0], n.dtype),
                  jnp.array([0.0, 0.0, 1.0], n.dtype))
    t1 = a - n * jnp.dot(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), _MINVAL)
    return jnp.stack([n, t1, jnp.cross(n, t1)])


# ---------------------------------------------------------------------------
# Narrowphase primitives.  Each returns (dist (R,), pos (R,3), frame
# (R,3,3)) with a fixed row count R, and is vmapped over its pair group.
# ---------------------------------------------------------------------------


def plane_sphere(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    r = s2[0]
    dist = jnp.dot(n, p2 - p1) - r
    pos = p2 - n * (r + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def plane_capsule(p1, m1, s1, p2, m2, s2):
    """Two cap contacts; tangent1 is the capsule axis projected onto the
    plane (mjc_PlaneCapsule's frame convention)."""
    n = m1[:, 2]
    r, hl = s2[0], s2[1]
    axis = m2[:, 2]
    t1 = axis - n * jnp.dot(n, axis)
    t1n = jnp.linalg.norm(t1)
    fallback = _make_frame(n)[1]
    t1 = jnp.where(t1n < 1e-10, fallback, t1 / jnp.maximum(t1n, _MINVAL))
    frame = jnp.stack([n, t1, jnp.cross(n, t1)])
    caps = p2[None, :] + jnp.stack([hl * axis, -hl * axis])
    dist = caps @ n - jnp.dot(n, p1) - r
    pos = caps - n[None, :] * (r + 0.5 * dist)[:, None]
    return dist, pos, jnp.stack([frame, frame])


def plane_cylinder(p1, m1, s1, p2, m2, s2):
    """4 contacts: deepest rim point of each cap + two spread points on the
    lower cap (approximates mjc_PlaneCylinder)."""
    n = m1[:, 2]
    r, hl = s2[0], s2[1]
    axis = m2[:, 2]
    proj = n - axis * jnp.dot(n, axis)
    pn = jnp.linalg.norm(proj)
    radial = jnp.where(pn < 1e-8, m2[:, 0], -proj / jnp.maximum(pn, _MINVAL))
    t = jnp.cross(axis, radial)
    lower = jnp.where(jnp.dot(n, axis) < 0, 1.0, -1.0)
    c_lo = p2 + lower * hl * axis
    pts = jnp.stack([
        p2 + hl * axis + r * radial,
        p2 - hl * axis + r * radial,
        c_lo + r * (radial * jnp.cos(2.0944) + t * jnp.sin(2.0944)),
        c_lo + r * (radial * jnp.cos(2.0944) - t * jnp.sin(2.0944)),
    ])
    dist = pts @ n - jnp.dot(n, p1)
    pos = pts - n[None, :] * 0.5 * dist[:, None]
    frame = _make_frame(n)
    return dist, pos, jnp.broadcast_to(frame, (4, 3, 3))


def plane_ellipsoid(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    nloc = m2.T @ n
    denom = jnp.sqrt(jnp.sum((s2 * nloc) ** 2))
    sp = p2 + m2 @ (-(s2 ** 2) * nloc / jnp.maximum(denom, _MINVAL))
    dist = jnp.dot(n, sp - p1)
    pos = sp - n * 0.5 * dist
    return dist[None], pos[None], _make_frame(n)[None]


_CORNER_SIGNS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)])


def plane_box(p1, m1, s1, p2, m2, s2):
    n = m1[:, 2]
    corners = p2[None, :] + (jnp.asarray(_CORNER_SIGNS, s2.dtype)
                             * s2[None, :]) @ m2.T  # (8, 3)
    h = corners @ n - jnp.dot(n, p1)
    order = jnp.argsort(h)[:4]
    dist = h[order]
    pos = corners[order] - n[None, :] * 0.5 * dist[:, None]
    frame = _make_frame(n)
    return dist, pos, jnp.broadcast_to(frame, (4, 3, 3))


def _sphere_pair(c1, r1, c2, r2):
    diff = c2 - c1
    ln = jnp.linalg.norm(diff)
    n = diff / jnp.maximum(ln, _MINVAL)
    dist = ln - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def sphere_sphere(p1, m1, s1, p2, m2, s2):
    return _sphere_pair(p1, s1[0], p2, s2[0])


def _closest_on_seg(p, a, b):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), _MINVAL)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def sphere_capsule(p1, m1, s1, p2, m2, s2):
    axis = m2[:, 2]
    c = _closest_on_seg(p1, p2 - s2[1] * axis, p2 + s2[1] * axis)
    return _sphere_pair(p1, s1[0], c, s2[0])


def capsule_capsule(p1, m1, s1, p2, m2, s2):
    a1 = p1 - s1[1] * m1[:, 2]
    d1 = 2 * s1[1] * m1[:, 2]
    a2 = p2 - s2[1] * m2[:, 2]
    d2 = 2 * s2[1] * m2[:, 2]
    r = a1 - a2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > _MINVAL,
                  jnp.clip((b * f - c * e) / jnp.maximum(denom, _MINVAL),
                           0, 1), 0.0)
    t = (b * s + f) / jnp.maximum(e, _MINVAL)
    s = jnp.where(t < 0, jnp.clip(-c / jnp.maximum(a, _MINVAL), 0, 1), s)
    s = jnp.where(t > 1, jnp.clip((b - c) / jnp.maximum(a, _MINVAL), 0, 1), s)
    t = jnp.clip(t, 0.0, 1.0)
    return _sphere_pair(a1 + d1 * s, s1[0], a2 + d2 * t, s2[0])


def _sphere_box(center, radius, p2, m2, s2):
    c = m2.T @ (center - p2)
    clamped = jnp.clip(c, -s2, s2)
    inside = jnp.all(jnp.abs(c) < s2)
    diff = c - clamped
    ln = jnp.linalg.norm(diff)
    n_out = diff / jnp.maximum(ln, _MINVAL)
    dist_out = ln - radius
    depth = s2 - jnp.abs(c)
    ax = jnp.argmin(depth)
    sign = jnp.sign(c[ax] + 1e-30)
    n_in = jnp.zeros(3, c.dtype).at[ax].set(sign)
    dist_in = -(depth[ax] + radius)
    surf = jnp.where(inside, c + n_in * depth[ax], clamped)
    n_loc = jnp.where(inside, n_in, n_out)
    dist = jnp.where(inside, dist_in, dist_out)
    n_world = -(m2 @ n_loc)
    pos = p2 + m2 @ surf - 0.5 * dist * (m2 @ n_loc)
    return dist, pos, _make_frame(n_world)


def sphere_box(p1, m1, s1, p2, m2, s2):
    dist, pos, frame = _sphere_box(p1, s1[0], p2, m2, s2)
    return dist[None], pos[None], frame[None]


def capsule_box(p1, m1, s1, p2, m2, s2):
    """Approximate: sphere-box tests at the two segment ends and at the
    point closest to the box center (3 rows)."""
    axis = m1[:, 2]
    a, b = p1 - s1[1] * axis, p1 + s1[1] * axis
    mid = _closest_on_seg(p2, a, b)
    rows = [_sphere_box(c, s1[0], p2, m2, s2) for c in (a, b, mid)]
    return (jnp.stack([r[0] for r in rows]),
            jnp.stack([r[1] for r in rows]),
            jnp.stack([r[2] for r in rows]))


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


@functools.lru_cache(maxsize=None)
def _layout_cached(key):
    return None  # placeholder (layout computed per model below)


def contact_groups(m: Model):
    """Static grouping of candidate pairs by collider type.

    Returns a list of (fn, nrows, pairs) where pairs is a list of
    (g1, g2, condim); row order is group-major, pair-major, row-major —
    the canonical contact ordering for this model.
    """
    groups = {}
    order = []
    contact_off = bool(m.opt and (m.opt.disableflags & DisableBit.CONTACT))
    if contact_off:
        return []
    for g1, g2 in m.collision_pairs:
        key = (GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2]))
        if key not in _DISPATCH:
            raise NotImplementedError(
                f"collision {key[0].name}-{key[1].name} "
                f"(geoms {g1},{g2}) not supported yet")
        p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
        if p1 != p2:
            condim = m.geom_condim[g1 if p1 > p2 else g2]
        else:
            condim = max(m.geom_condim[g1], m.geom_condim[g2])
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append((g1, g2, int(condim)))
    return [(_DISPATCH[key][0], _DISPATCH[key][1], groups[key])
            for key in order]


def contact_rows_static(m: Model):
    """Flat static row structure: (dims, geom1s, geom2s) tuples."""
    dims, g1s, g2s = [], [], []
    for fn, nrows, pairs in contact_groups(m):
        for g1, g2, condim in pairs:
            for _ in range(nrows):
                dims.append(condim)
                g1s.append(g1)
                g2s.append(g2)
    return tuple(dims), tuple(g1s), tuple(g2s)


def empty_contact(m: Model, dtype) -> Contact:
    """A contact pytree with the model's static row structure, all rows
    inactive (dist = +inf) — keeps Data structure constant across steps."""
    dims, g1s, g2s = contact_rows_static(m)
    n = len(dims)
    z = jnp.zeros
    return Contact(
        dist=jnp.full((n,), jnp.inf, dtype=dtype),
        pos=z((n, 3), dtype=dtype),
        frame=(jnp.tile(jnp.eye(3, dtype=dtype), (n, 1, 1)) if n
               else z((n, 3, 3), dtype=dtype)),
        includemargin=z(n, dtype=dtype),
        friction=jnp.ones((n, 5), dtype=dtype),
        solref=(jnp.tile(jnp.array([0.02, 1.0], dtype), (n, 1)) if n
                else z((n, 2), dtype=dtype)),
        solimp=(jnp.tile(jnp.array([0.9, 0.95, 0.001, 0.5, 2.0], dtype),
                         (n, 1)) if n else z((n, 5), dtype=dtype)),
        dim=dims, geom1=g1s, geom2=g2s,
    )


def _pair_params_arrays(m: Model, pairs):
    """Vectorized mj_contactParam over a pair group: returns per-pair
    (friction5, solref, solimp, includemargin) arrays."""
    g1 = np.array([p[0] for p in pairs])
    g2 = np.array([p[1] for p in pairs])
    pr1 = np.array([m.geom_priority[g] for g in g1])
    pr2 = np.array([m.geom_priority[g] for g in g2])
    f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
    sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
    si1, si2 = m.geom_solimp[g1], m.geom_solimp[g2]

    use1 = jnp.asarray((pr1 > pr2)[:, None])
    use2 = jnp.asarray((pr2 > pr1)[:, None])
    mixp = jnp.asarray((pr1 == pr2)[:, None])

    s1 = jnp.maximum(m.geom_solmix[g1], _MINVAL)[:, None]
    s2 = jnp.maximum(m.geom_solmix[g2], _MINVAL)[:, None]
    w1 = s1 / (s1 + s2)
    w2 = s2 / (s1 + s2)

    friction = jnp.where(use1, f1, jnp.where(use2, f2, jnp.maximum(f1, f2)))
    solref_mix = jnp.where(
        jnp.logical_and(sr1[:, :1] > 0, sr2[:, :1] > 0),
        w1 * sr1 + w2 * sr2, jnp.minimum(sr1, sr2))
    solref = jnp.where(use1, sr1, jnp.where(use2, sr2, solref_mix))
    solimp = jnp.where(use1, si1, jnp.where(use2, si2, w1 * si1 + w2 * si2))
    margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
    gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
    mu = friction
    friction5 = jnp.stack(
        [mu[:, 0], mu[:, 0], mu[:, 1], mu[:, 2], mu[:, 2]], axis=-1)
    return friction5, solref, solimp, margin - gap


def collision(m: Model, d: Data) -> Data:
    """Vectorized narrowphase over the static pair groups."""
    dtype = d.qpos.dtype
    groups = contact_groups(m)
    if not groups:
        return d.replace(contact=empty_contact(m, dtype))

    dists, poss, frames = [], [], []
    incs, fris, srs, sis = [], [], [], []
    dims, g1all, g2all = contact_rows_static(m)
    for fn, nrows, pairs in groups:
        g1 = np.array([p[0] for p in pairs])
        g2 = np.array([p[1] for p in pairs])
        p1, m1, s1 = d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1]
        p2, m2, s2 = d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2]
        dist, pos, frame = jax.vmap(fn)(p1, m1, s1, p2, m2, s2)
        # (P, R, ...) → (P*R, ...)
        dists.append(dist.reshape(-1))
        poss.append(pos.reshape(-1, 3))
        frames.append(frame.reshape(-1, 3, 3))
        fr5, sr, si, inc = _pair_params_arrays(m, pairs)
        rep = lambda x: jnp.repeat(x, nrows, axis=0)
        fris.append(rep(fr5))
        srs.append(rep(sr))
        sis.append(rep(si))
        incs.append(rep(inc))

    contact = Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        includemargin=jnp.concatenate(incs),
        friction=jnp.concatenate(fris),
        solref=jnp.concatenate(srs),
        solimp=jnp.concatenate(sis),
        dim=dims, geom1=g1all, geom2=g2all,
    )
    return d.replace(contact=contact)
