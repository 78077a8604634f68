"""Quaternion, rotation and 6D spatial algebra for the physics engine.

Conventions follow MuJoCo (the engine the reference wraps via ctypes,
dm_control/mujoco/wrapper/):

- quaternions are ``(w, x, y, z)``, unit norm;
- rotation matrices are world-from-local;
- 6D spatial motion vectors are ``[angular(3), linear(3)]`` and force
  vectors are ``[torque(3), force(3)]`` (mjData.cvel / cfrc layout);
- spatial inertias are stored as the 10-vector
  ``[I_xx, I_xy, I_xz, I_yy, I_yz, I_zz, m*c_x, m*c_y, m*c_z, m]``
  about a given origin (mjData.cinert layout).

All functions are shape-polymorphic over leading batch dimensions and safe
under jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Vectors.
# ---------------------------------------------------------------------------


def normalize(v, axis=-1, eps=0.0):
    """Normalizes ``v``; returns v unchanged (scaled by 1/eps-guard) if tiny."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, jnp.asarray(1e-15 if eps == 0.0 else eps, v.dtype))


def norm_safe(v, axis=-1):
    """Norm with a gradient-safe sqrt (0 at 0)."""
    sq = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, 1e-30)) * (sq > 0)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z).
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float64):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(u, v):
    """Hamilton product u ⊗ v."""
    w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q):
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q):
    return normalize(q)


def rotate(vec, quat):
    """Rotates ``vec`` by ``quat`` (world = R(quat) @ local)."""
    w = quat[..., :1]
    u = quat[..., 1:]
    c = jnp.cross(u, vec)
    return vec + 2.0 * (w * c + jnp.cross(u, c))


def rotate_inv(vec, quat):
    """Rotates ``vec`` by the inverse of ``quat``."""
    return rotate(vec, quat_conj(quat))


def quat_to_mat(q):
    """Quaternion → 3x3 rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """3x3 rotation matrix → quaternion, branch-free (Shepperd's method)."""
    # Four candidate constructions, pick the numerically best by trace terms.
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-30)) / 2.0

    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand0 = jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], -1)
    cand1 = jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], -1)
    cand2 = jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], -1)
    cand3 = jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], -1)

    idx = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, -1), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def axis_angle_to_quat(axis, angle):
    """Unit axis + angle → quaternion."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_axis_angle(q):
    """Quaternion → (axis*angle) rotation 3-vector (mju_quat2Vel with dt=1)."""
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    axis = q[..., 1:] / jnp.maximum(sin_half, 1e-15)[..., None]
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
    # Map angle to [-pi, pi] for the shortest path.
    angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    return axis * angle[..., None]


def quat_integrate(q, omega, dt):
    """Integrates quaternion by local angular velocity ``omega`` for ``dt``.

    Matches MuJoCo's mju_quatIntegrate: q' = q ⊗ exp(omega*dt/2).
    """
    angle = jnp.linalg.norm(omega, axis=-1) * dt
    axis = normalize(omega)
    dq = axis_angle_to_quat(axis, angle)
    return quat_normalize(quat_mul(q, dq))


def quat_sub(qa, qb):
    """Velocity that rotates qb into qa in unit time (mju_subQuat, local frame)."""
    return quat_to_axis_angle(quat_mul(quat_conj(qb), qa))


def euler_to_quat(euler, seq="xyz", degrees=False):
    """Euler angles → quaternion.

    ``seq`` in lowercase = extrinsic (MuJoCo compiler default "xyz"),
    uppercase = intrinsic.  Matches the MJCF compiler's handling of the
    ``euler`` attribute.
    """
    euler = jnp.asarray(euler, dtype=jnp.result_type(float))
    if degrees:
        euler = euler * (jnp.pi / 180.0)
    q = jnp.broadcast_to(
        jnp.array([1.0, 0, 0, 0], euler.dtype), euler.shape[:-1] + (4,)
    )
    basis = {"x": jnp.array([1.0, 0, 0]), "y": jnp.array([0, 1.0, 0]),
             "z": jnp.array([0, 0, 1.0])}
    for i, ax in enumerate(seq):
        rot = axis_angle_to_quat(
            basis[ax.lower()].astype(euler.dtype), euler[..., i]
        )
        if ax.islower():  # extrinsic: pre-multiply
            q = quat_mul(rot, q)
        else:  # intrinsic: post-multiply
            q = quat_mul(q, rot)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Spatial (6D) algebra.  Motion/force vectors are [angular(3), linear(3)].
# ---------------------------------------------------------------------------


def motion_cross(v, m):
    """Spatial motion cross product v × m (mju_crossMotion)."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vang, mang), jnp.cross(vang, mlin) + jnp.cross(vlin, mang)],
        axis=-1,
    )


def force_cross(v, f):
    """Spatial force cross product v ×* f (mju_crossForce)."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vang, fang) + jnp.cross(vlin, flin), jnp.cross(vang, flin)],
        axis=-1,
    )


def transform_motion(vec, offset, rotmat=None):
    """Translates (and optionally rotates) a spatial motion vector.

    New frame origin is at ``offset`` from the old origin, expressed in the
    old frame.  If ``rotmat`` (new-from-old? no: world-from-local of the NEW
    frame relative to old) is given, components are rotated into the new
    frame: matches mju_transformSpatial with flg_force=0.
    """
    ang, lin = vec[..., :3], vec[..., 3:]
    lin = lin - jnp.cross(offset, ang)
    if rotmat is not None:
        # rotate world components into the new frame: R^T @ v
        ang = jnp.einsum("...ij,...i->...j", rotmat, ang)
        lin = jnp.einsum("...ij,...i->...j", rotmat, lin)
    return jnp.concatenate([ang, lin], axis=-1)


def transform_force(vec, offset):
    """Translates a spatial force vector to a new origin at ``offset``."""
    ang, lin = vec[..., :3], vec[..., 3:]
    ang = ang - jnp.cross(offset, lin)
    return jnp.concatenate([ang, lin], axis=-1)


# ---------------------------------------------------------------------------
# 10-parameter spatial inertia (cinert layout): [Ivec(6), m*c(3), m].
# Ivec packs the symmetric 3x3 inertia as [xx, yy, zz, xy, xz, yz]
# about the frame origin.
# ---------------------------------------------------------------------------


def inert_from_body(mass, inertia_diag, ipos, imat):
    """Builds the 10-vector spatial inertia of a body about a frame origin.

    Args:
      mass: scalar body mass.
      inertia_diag: (3,) principal moments of inertia.
      ipos: (3,) position of the body CoM relative to the frame origin.
      imat: (3, 3) rotation world-from-inertial of the principal axes.
    """
    # Rotate principal inertia into the frame: I = R diag(i) R^T.
    i_world = jnp.einsum(
        "...ij,...j,...kj->...ik", imat, inertia_diag, imat
    )
    # Parallel axis: translate from CoM to frame origin.
    c = ipos
    c2 = jnp.sum(c * c, axis=-1)
    outer = c[..., :, None] * c[..., None, :]
    shift = mass[..., None, None] * (
        c2[..., None, None] * jnp.eye(3, dtype=i_world.dtype) - outer
    )
    i_total = i_world + shift
    ivec = jnp.stack(
        [i_total[..., 0, 0], i_total[..., 1, 1], i_total[..., 2, 2],
         i_total[..., 0, 1], i_total[..., 0, 2], i_total[..., 1, 2]],
        axis=-1,
    )
    return jnp.concatenate(
        [ivec, mass[..., None] * c, mass[..., None]], axis=-1
    )


def inert_mul(inert, vec):
    """Applies a 10-vector spatial inertia to a motion vector → force vector.

    f_ang = I @ w + c × (m v - ... ) — the standard formula:
      ang = I w + h × v,  lin = m v - h × w,  where h = m c.
    """
    ixx, iyy, izz = inert[..., 0], inert[..., 1], inert[..., 2]
    ixy, ixz, iyz = inert[..., 3], inert[..., 4], inert[..., 5]
    h = inert[..., 6:9]
    m = inert[..., 9:10]
    w, v = vec[..., :3], vec[..., 3:]
    iw = jnp.stack(
        [
            ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
            ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
            ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
        ],
        axis=-1,
    )
    ang = iw + jnp.cross(h, v)
    lin = m * v - jnp.cross(h, w)
    return jnp.concatenate([ang, lin], axis=-1)


def inert_shift(inert, offset, rotmat=None):
    """Expresses a spatial inertia about a new origin (offset in old frame).

    The new origin is at ``offset`` from the old origin.  If ``rotmat`` is
    given the inertia components are also rotated (R^T I R) into the new
    frame axes.
    """
    ixx, iyy, izz = inert[..., 0], inert[..., 1], inert[..., 2]
    ixy, ixz, iyz = inert[..., 3], inert[..., 4], inert[..., 5]
    i_mat = jnp.stack(
        [
            jnp.stack([ixx, ixy, ixz], -1),
            jnp.stack([ixy, iyy, iyz], -1),
            jnp.stack([ixz, iyz, izz], -1),
        ],
        axis=-2,
    )
    h = inert[..., 6:9]
    m = inert[..., 9]

    # CoM relative to old origin.
    c_old = h / jnp.maximum(m[..., None], 1e-15)
    # Move origin: new CoM offset c_new = c_old - offset.
    c_new = c_old - offset

    def _shift_term(c):
        c2 = jnp.sum(c * c, axis=-1)
        outer = c[..., :, None] * c[..., None, :]
        return m[..., None, None] * (
            c2[..., None, None] * jnp.eye(3, dtype=inert.dtype) - outer
        )

    # I about CoM, then parallel-axis to the new origin.
    i_com = i_mat - _shift_term(c_old)
    if rotmat is not None:
        i_com = jnp.einsum("...ji,...jk,...kl->...il", rotmat, i_com, rotmat)
        c_new = jnp.einsum("...ij,...i->...j", rotmat, c_new)
    i_new = i_com + _shift_term(c_new)
    ivec = jnp.stack(
        [i_new[..., 0, 0], i_new[..., 1, 1], i_new[..., 2, 2],
         i_new[..., 0, 1], i_new[..., 0, 2], i_new[..., 1, 2]],
        axis=-1,
    )
    return jnp.concatenate(
        [ivec, m[..., None] * c_new, m[..., None]], axis=-1
    )
