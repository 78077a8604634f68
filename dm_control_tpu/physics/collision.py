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


def _ellipsoid_closest(c, size):
    """Closest point on an (origin-centered, axis-aligned) ellipsoid surface
    to point ``c``: x(l) = c / (1 + l a_i^-2)?  Solved via Newton on the
    Lagrange multiplier with a fixed iteration count (jit-friendly)."""
    a2 = size ** 2

    def phi(lam):
        x = c / (1.0 + lam / a2)
        return jnp.sum(x * x / a2) - 1.0

    def dphi(lam):
        x = c / (1.0 + lam / a2)
        return jnp.sum(-2.0 * x * x / (a2 * a2 * (1.0 + lam / a2)))

    lam = jnp.asarray(0.0, c.dtype)
    for _ in range(12):
        lam = lam - phi(lam) / jnp.where(jnp.abs(dphi(lam)) < _MINVAL,
                                         _MINVAL, dphi(lam))
    x = c / (1.0 + lam / a2)
    return x


def sphere_ellipsoid(p1, m1, s1, p2, m2, s2):
    c = m2.T @ (p1 - p2)  # sphere center in ellipsoid frame
    x = _ellipsoid_closest(c, s2)
    n_loc = x / jnp.maximum(jnp.asarray(s2) ** 2, _MINVAL)
    n_loc = n_loc / jnp.maximum(jnp.linalg.norm(n_loc), _MINVAL)
    inside = jnp.sum((c / s2) ** 2) < 1.0
    sgn = jnp.where(inside, -1.0, 1.0)
    dist = sgn * jnp.linalg.norm(c - x) - s1[0]
    n_world = -sgn * (m2 @ n_loc)  # from sphere (geom1) into ellipsoid
    surf = p2 + m2 @ x
    pos = surf - 0.5 * dist * (-n_world)
    return dist[None], pos[None], _make_frame(n_world)[None]


def capsule_ellipsoid(p1, m1, s1, p2, m2, s2):
    """Fixed-point iteration: closest segment point <-> ellipsoid point."""
    axis = m1[:, 2]
    a_w, b_w = p1 - s1[1] * axis, p1 + s1[1] * axis
    a = m2.T @ (a_w - p2)
    b = m2.T @ (b_w - p2)
    c = 0.5 * (a + b)
    for _ in range(6):
        x = _ellipsoid_closest(c, s2)
        c = _closest_on_seg(x, a, b)
    x = _ellipsoid_closest(c, s2)
    n_loc = x / jnp.maximum(jnp.asarray(s2) ** 2, _MINVAL)
    n_loc = n_loc / jnp.maximum(jnp.linalg.norm(n_loc), _MINVAL)
    inside = jnp.sum((c / s2) ** 2) < 1.0
    sgn = jnp.where(inside, -1.0, 1.0)
    dist = sgn * jnp.linalg.norm(c - x) - s1[0]
    n_world = -sgn * (m2 @ n_loc)
    pos = p2 + m2 @ x - 0.5 * dist * (-n_world)
    return dist[None], pos[None], _make_frame(n_world)[None]


def capsule_cylinder(p1, m1, s1, p2, m2, s2):
    """Approximation: the cylinder's lateral surface acts as a capsule of
    the same radius/half-length for radial contacts, with cap-disk
    handling when the closest segment point lies beyond the caps."""
    r1, h1 = s1[0], s1[1]
    r2, h2 = s2[0], s2[1]
    a1 = p1 - h1 * m1[:, 2]
    b1 = p1 + h1 * m1[:, 2]
    axis2 = m2[:, 2]
    # closest point on capsule segment to cylinder axis line segment
    a2, b2 = p2 - h2 * axis2, p2 + h2 * axis2
    # reuse capsule-capsule closest-point math
    d1v = b1 - a1
    d2v = b2 - a2
    rvec = a1 - a2
    a = jnp.dot(d1v, d1v)
    e = jnp.dot(d2v, d2v)
    f = jnp.dot(d2v, rvec)
    cc = jnp.dot(d1v, rvec)
    b = jnp.dot(d1v, d2v)
    denom = a * e - b * b
    s = jnp.where(denom > _MINVAL,
                  jnp.clip((b * f - cc * e) / jnp.maximum(denom, _MINVAL),
                           0, 1), 0.0)
    t = (b * s + f) / jnp.maximum(e, _MINVAL)
    s = jnp.where(t < 0, jnp.clip(-cc / jnp.maximum(a, _MINVAL), 0, 1), s)
    s = jnp.where(t > 1, jnp.clip((b - cc) / jnp.maximum(a, _MINVAL), 0, 1),
                  s)
    t = jnp.clip(t, 0.0, 1.0)
    pc = a1 + d1v * s  # capsule point
    pz = a2 + d2v * t  # cylinder axis point
    # radial (side) contact
    radial = pc - pz
    axial_comp = jnp.dot(radial, axis2)
    radial_perp = radial - axial_comp * axis2
    rp_norm = jnp.linalg.norm(radial_perp)
    on_side = (jnp.abs(jnp.dot(pc - p2, axis2)) <= h2) | (rp_norm > _MINVAL)
    # side contact
    n_side = -radial_perp / jnp.maximum(rp_norm, _MINVAL)
    dist_side = rp_norm - r2 - r1
    pos_side = pc + n_side * (r1 + 0.5 * dist_side)
    # cap contact: capsule end beyond the cap plane
    cap_sign = jnp.sign(axial_comp + 1e-30)
    cap_center = p2 + cap_sign * h2 * axis2
    n_cap = -cap_sign * axis2  # from capsule into cylinder
    drop = pc - cap_center
    in_disk = drop - jnp.dot(drop, axis2) * axis2
    in_disk_n = jnp.linalg.norm(in_disk)
    clamped = cap_center + in_disk * jnp.minimum(
        1.0, r2 / jnp.maximum(in_disk_n, _MINVAL))
    dist_cap = jnp.dot(pc - cap_center, cap_sign * axis2) - r1
    pos_cap = pc - cap_sign * axis2 * (r1 + 0.5 * dist_cap)
    use_cap = (jnp.abs(axial_comp) > h2) & (in_disk_n < r2)
    dist = jnp.where(use_cap, dist_cap, dist_side)
    pos = jnp.where(use_cap, pos_cap, pos_side)
    n = jnp.where(use_cap, n_cap, n_side)
    return dist[None], pos[None], _make_frame(n)[None]


# ---------------------------------------------------------------------------
# Heightfield colliders: terrain height sampled bilinearly; contacts at a
# fixed set of support points of the other geom.  The hfield elevation data
# is a model array leaf (regenerable per episode, e.g. quadruped escape).
# ---------------------------------------------------------------------------


def _hf_surface(data, size, p_local):
    """Terrain surface height and normal under local (x, y)."""
    nrow, ncol = data.shape
    fx = jnp.clip((p_local[0] / size[0] + 1.0) * 0.5 * (ncol - 1),
                  0.0, ncol - 1.001)
    fy = jnp.clip((p_local[1] / size[1] + 1.0) * 0.5 * (nrow - 1),
                  0.0, nrow - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    h00 = data[y0, x0]
    h01 = data[y0, x0 + 1]
    h10 = data[y0 + 1, x0]
    h11 = data[y0 + 1, x0 + 1]
    h = ((1 - ty) * ((1 - tx) * h00 + tx * h01)
         + ty * ((1 - tx) * h10 + tx * h11)) * size[2]
    # cell slopes → surface normal (local frame)
    cell_dx = size[0] * 2.0 / (ncol - 1)
    cell_dy = size[1] * 2.0 / (nrow - 1)
    dhdx = (((1 - ty) * (h01 - h00) + ty * (h11 - h10)) * size[2]) / cell_dx
    dhdy = (((1 - tx) * (h10 - h00) + tx * (h11 - h01)) * size[2]) / cell_dy
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)])
    n = n / jnp.linalg.norm(n)
    return h, n


def _hf_point_contacts(data, size, m1, p1, pts_world, radius):
    """Contacts of world sample points (with radius) against the terrain."""
    loc = (pts_world - p1[None, :]) @ m1  # hfield-local
    h, n_loc = jax.vmap(lambda p: _hf_surface(data, size, p))(loc)
    surf_loc = jnp.stack([loc[:, 0], loc[:, 1], h], 1)
    dist = jnp.einsum("kc,kc->k", loc - surf_loc, n_loc) - radius
    n_world = n_loc @ m1.T
    pos = pts_world - n_world * (radius + 0.5 * dist)[:, None]
    frames = jax.vmap(_make_frame)(n_world)
    return dist, pos, frames


def make_hfield_collider(data, size, sample_fn):
    def collider(p1, m1, s1, p2, m2, s2):
        pts, radius = sample_fn(p2, m2, s2)
        return _hf_point_contacts(data, size, m1, p1, pts, radius)

    return collider


def _hf_sphere_samples(p2, m2, s2):
    return p2[None, :], s2[0]


def _hf_capsule_samples(p2, m2, s2):
    axis = m2[:, 2]
    return jnp.stack([p2 + s2[1] * axis, p2 - s2[1] * axis]), s2[0]


def _hf_cylinder_samples(p2, m2, s2):
    # capsule approximation of the cylinder
    axis = m2[:, 2]
    return jnp.stack([p2 + s2[1] * axis, p2 - s2[1] * axis]), s2[0]


def _hf_box_samples(p2, m2, s2):
    corners = p2[None, :] + (jnp.asarray(_CORNER_SIGNS, s2.dtype)
                             * s2[None, :]) @ m2.T
    return corners, jnp.zeros((), s2.dtype)


def _hf_ellipsoid_samples(p2, m2, s2):
    # sample the ellipsoid bottom pole (terrain assumed z-up) with the
    # minor-axis radius as the contact radius
    r = jnp.min(s2)
    return (p2 - jnp.array([0.0, 0.0, 1.0], s2.dtype)
            * (jnp.max(s2) - r))[None, :], r


_HFIELD_SAMPLES = {
    GeomType.SPHERE: (_hf_sphere_samples, 1),
    GeomType.CAPSULE: (_hf_capsule_samples, 2),
    GeomType.CYLINDER: (_hf_cylinder_samples, 2),
    GeomType.ELLIPSOID: (_hf_ellipsoid_samples, 1),
    GeomType.BOX: (_hf_box_samples, 8),
}


def cylinder_cylinder(p1, m1, s1, p2, m2, s2):
    """Approximated as capsule-capsule (side contacts dominate for the
    suite's cylinder pairs, e.g. finger segments vs. spinner)."""
    return capsule_capsule(p1, m1, s1, p2, m2, s2)


def ellipsoid_ellipsoid(p1, m1, s1, p2, m2, s2):
    """Alternating closest-point projection between the two surfaces."""
    x1w = p1
    x2w = p2
    for _ in range(6):
        c2 = m2.T @ (x1w - p2)
        x2w = p2 + m2 @ _ellipsoid_closest(c2, s2)
        c1 = m1.T @ (x2w - p1)
        x1w = p1 + m1 @ _ellipsoid_closest(c1, s1)
    diff = x2w - x1w
    ln = jnp.linalg.norm(diff)
    # overlap sign: is x2's surface point inside ellipsoid 1?
    v = m1.T @ (x2w - p1)
    inside = jnp.sum((v / s1) ** 2) < 1.0
    sgn = jnp.where(inside, -1.0, 1.0)
    dist = sgn * ln
    n = sgn * diff / jnp.maximum(ln, _MINVAL)
    pos = 0.5 * (x1w + x2w)
    return dist[None], pos[None], _make_frame(n)[None]


def _closest_on_box(c, size):
    """Closest surface point of an origin-centered AABB to local point c."""
    clamped = jnp.clip(c, -size, size)
    inside = jnp.all(jnp.abs(c) < size)
    depth = size - jnp.abs(c)
    ax = jnp.argmin(depth)
    sign = jnp.sign(c[ax] + 1e-30)
    pushed = clamped.at[ax].set(sign * size[ax])
    return jnp.where(inside, pushed, clamped), inside


def ellipsoid_box(p1, m1, s1, p2, m2, s2):
    """Alternating projection between ellipsoid and box surfaces."""
    x1w = p1
    for _ in range(6):
        c2 = m2.T @ (x1w - p2)
        xb, _ = _closest_on_box(c2, s2)
        x2w = p2 + m2 @ xb
        c1 = m1.T @ (x2w - p1)
        x1w = p1 + m1 @ _ellipsoid_closest(c1, s1)
    diff = x2w - x1w
    ln = jnp.linalg.norm(diff)
    v = m1.T @ (x2w - p1)
    inside = jnp.sum((v / s1) ** 2) < 1.0
    sgn = jnp.where(inside, -1.0, 1.0)
    dist = sgn * ln
    n = sgn * diff / jnp.maximum(ln, _MINVAL)
    pos = 0.5 * (x1w + x2w)
    return dist[None], pos[None], _make_frame(n)[None]


def sphere_cylinder(p1, m1, s1, p2, m2, s2):
    """Sphere vs cylinder via the capsule-cylinder machinery (zero-length
    capsule)."""
    return capsule_cylinder(p1, m1, jnp.stack([s1[0], jnp.zeros_like(s1[0]),
                                               jnp.zeros_like(s1[0])]),
                            p2, m2, s2)


def ellipsoid_cylinder(p1, m1, s1, p2, m2, s2):
    """Ellipsoid vs cylinder: the cylinder is approximated as a capsule of
    the same radius/half-length (as in cylinder_cylinder) and fed through
    the capsule-ellipsoid projection with the arguments swapped; the normal
    is flipped back to point from the ellipsoid (geom1) into the cylinder."""
    dist, pos, frame = capsule_ellipsoid(p2, m2, s2, p1, m1, s1)
    return dist, pos, jax.vmap(_make_frame)(-frame[:, 0])


def cylinder_box(p1, m1, s1, p2, m2, s2):
    """Cylinder vs box: capsule approximation of the cylinder through the
    3-row capsule-box collider (both end-spheres + nearest interior)."""
    return capsule_box(p1, m1, s1, p2, m2, s2)


_BOX_FACE_AXES = np.eye(3)


def box_box(p1, m1, s1, p2, m2, s2):
    """OBB-OBB via SAT (faces only) + 8-corner clipping: up to 8 rows.

    Approximates mjc_BoxBox: the minimum-penetration face axis defines the
    normal; the other box's corners inside the reference box's face slab
    become contacts.  Edge-edge cases fall back to the best face axis.
    """
    # relative rotation/translation in box1 frame
    r = m1.T @ m2  # (3,3)
    t = m1.T @ (p2 - p1)
    absr = jnp.abs(r) + 1e-9

    # face axes of box1 (in box1 frame): penetration along axis i
    proj2_1 = absr @ s2  # half-extent of box2 projected on box1 axes
    sep1 = jnp.abs(t) - (s1 + proj2_1)  # (3,) separation (neg = overlap)
    # face axes of box2
    proj1_2 = absr.T @ s1
    t2 = r.T @ t
    sep2 = jnp.abs(t2) - (s2 + proj1_2)

    seps = jnp.concatenate([sep1, sep2])  # (6,)
    best = jnp.argmax(seps)  # least-overlapping axis (closest to separating)
    # normal in world frame, pointing from box1 into box2
    axes_w = jnp.concatenate([m1.T, m2.T])  # (6, 3) rows are axis vectors
    n = axes_w[best]
    sign_ref = jnp.where(best < 3,
                         jnp.sign(t[best % 3] + 1e-30),
                         jnp.sign(t2[best % 3] + 1e-30))
    n = n * sign_ref

    # contacts: corners of the *other* box that penetrate the slab
    corners2 = p2[None, :] + (jnp.asarray(_CORNER_SIGNS, s2.dtype)
                              * s2[None, :]) @ m2.T  # (8,3)
    corners1 = p1[None, :] + (jnp.asarray(_CORNER_SIGNS, s1.dtype)
                              * s1[None, :]) @ m1.T
    use_box1_face = best < 3
    corners = jnp.where(use_box1_face, corners2, corners1)
    ref_p = jnp.where(use_box1_face, p1, p2)
    ref_m = jnp.where(use_box1_face, m1, m2)
    ref_s = jnp.where(use_box1_face, s1, s2)
    n_into = jnp.where(use_box1_face, n, -n)  # from ref box outward

    # signed distance of each candidate corner to the reference face plane
    face_center = ref_p + n_into * jnp.abs(
        jnp.dot(ref_m.T @ n_into, ref_s))
    dists = (corners - face_center) @ n_into
    # keep the 8 (all) corners; mark those outside the face footprint far
    local = (corners - ref_p[None, :]) @ ref_m  # in ref box frame
    n_loc = ref_m.T @ n_into
    face_ax = jnp.argmax(jnp.abs(n_loc))
    lat = jnp.stack([local[:, (face_ax + 1) % 3],
                     local[:, (face_ax + 2) % 3]], 1)
    lat_s = jnp.stack([ref_s[(face_ax + 1) % 3], ref_s[(face_ax + 2) % 3]])
    in_footprint = jnp.all(jnp.abs(lat) <= lat_s[None, :] + 1e-6, axis=1)
    dist = jnp.where(in_footprint, dists, jnp.inf)
    pos = corners - n_into[None, :] * 0.5 * dists[:, None]
    frame = _make_frame(n)
    return dist, pos, jnp.broadcast_to(frame, (8, 3, 3))


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
    (GeomType.SPHERE, GeomType.ELLIPSOID): (sphere_ellipsoid, 1),
    (GeomType.CAPSULE, GeomType.ELLIPSOID): (capsule_ellipsoid, 1),
    (GeomType.CAPSULE, GeomType.CYLINDER): (capsule_cylinder, 1),
    (GeomType.CYLINDER, GeomType.CYLINDER): (cylinder_cylinder, 1),
    (GeomType.ELLIPSOID, GeomType.ELLIPSOID): (ellipsoid_ellipsoid, 1),
    (GeomType.ELLIPSOID, GeomType.BOX): (ellipsoid_box, 1),
    (GeomType.SPHERE, GeomType.CYLINDER): (sphere_cylinder, 1),
    (GeomType.ELLIPSOID, GeomType.CYLINDER): (ellipsoid_cylinder, 1),
    (GeomType.CYLINDER, GeomType.BOX): (cylinder_box, 3),
    (GeomType.BOX, GeomType.BOX): (box_box, 8),
}


def supported_pair(t1: int, t2: int) -> bool:
    return (GeomType(t1), GeomType(t2)) in _DISPATCH


@functools.lru_cache(maxsize=None)
def _layout_cached(key):
    return None  # placeholder (layout computed per model below)


def _resolve_collider(m: Model, key):
    """(fn_or_none, nrows) for a type-pair key; hfield keys resolve to a
    data-closing collider at trace time."""
    if key[0] == GeomType.HFIELD:
        if key[1] not in _HFIELD_SAMPLES:
            return None, 0
        sample_fn, nrows = _HFIELD_SAMPLES[key[1]]
        return ("hfield", sample_fn), nrows
    if key not in _DISPATCH:
        return None, 0
    return _DISPATCH[key]


def contact_groups(m: Model):
    """Static grouping of candidate pairs by collider type.

    Returns a list of (key, nrows, pairs) where pairs is a list of
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
        fn, nrows = _resolve_collider(m, key)
        if fn is None:
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
    return [(key, _resolve_collider(m, key)[1], groups[key])
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
    for key, nrows, pairs in groups:
        fn, _ = _resolve_collider(m, key)
        if isinstance(fn, tuple) and fn[0] == "hfield":
            fn = make_hfield_collider(m.hfield_data, m.hfield_size[0],
                                      fn[1])
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
