"""State randomizers (reference: dm_control/suite/utils/randomizers.py:35).

``randomize_limited_and_rotational_joints`` draws in the *same order* as the
reference so the numpy-backed path reproduces its episode inits bit-for-bit
under a fixed seed.
"""

from __future__ import annotations

import numpy as np

from dm_control_tpu.physics.model import JointType, Model
from dm_control_tpu.rl.control import RandomContext


def _axis_angle_quat(axis, angle, np_mode):
    if np_mode:
        return np.concatenate([[np.cos(angle / 2)],
                               np.asarray(axis) * np.sin(angle / 2)])
    import jax.numpy as jnp

    return jnp.concatenate([jnp.cos(angle / 2)[None],
                            axis * jnp.sin(angle / 2)])


def random_limited_quaternion(rc: RandomContext, limit):
    """Random quaternion within `limit` radians of identity."""
    axis = rc.randn(3)
    if rc.is_numpy:
        axis = axis / np.linalg.norm(axis)
    else:
        import jax.numpy as jnp

        axis = axis / jnp.linalg.norm(axis)
    angle = rc.rand() * limit
    return _axis_angle_quat(axis, angle, rc.is_numpy)


def randomize_limited_and_rotational_joints(m: Model, qpos, rc: RandomContext):
    """Returns qpos with joints randomized per the reference rules:
    bounded hinge/slide uniform in range; unbounded hinge uniform [-pi, pi);
    ball/free-orientation quaternions uniform on the 3-sphere."""
    if rc.is_numpy:
        qpos = np.array(qpos)

        def setval(adr, width, value):
            qpos[adr:adr + width] = value
            return qpos
    else:
        def setval(adr, width, value):
            return qpos.at[adr:adr + width].set(value)

    import numpy as onp

    jr = onp.asarray(m.jnt_range)
    for j in range(m.njnt):
        jtype = JointType(m.jnt_type[j])
        limited = bool(m.jnt_limited[j])
        adr = m.jnt_qposadr[j]
        lo, hi = jr[j]
        if limited:
            if jtype in (JointType.HINGE, JointType.SLIDE):
                qpos = setval(adr, 1, rc.uniform(lo, hi))
            elif jtype == JointType.BALL:
                qpos = setval(adr, 4, random_limited_quaternion(rc, hi))
        else:
            if jtype == JointType.HINGE:
                qpos = setval(adr, 1, rc.uniform(-onp.pi, onp.pi))
            elif jtype == JointType.BALL:
                quat = rc.randn(4)
                quat = quat / _norm(quat, rc.is_numpy)
                qpos = setval(adr, 4, quat)
            elif jtype == JointType.FREE:
                quat = rc.rand(4)
                quat = quat / _norm(quat, rc.is_numpy)
                qpos = setval(adr + 3, 4, quat)
    return qpos


def _norm(v, np_mode):
    if np_mode:
        return np.linalg.norm(v)
    import jax.numpy as jnp

    return jnp.linalg.norm(v)
