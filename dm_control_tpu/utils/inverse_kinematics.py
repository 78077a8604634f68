"""Inverse kinematics: damped-least-squares site-pose solver.

Reimplements dm_control/utils/inverse_kinematics.py:37-260
(``qpos_from_site_pose`` and ``nullspace_method``) against the TPU-native
engine: the jacobian comes from the functional kinematics stage instead of
mj_jacSite, and integration uses the engine's manifold-aware
``integrate_pos``.
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from dm_control_tpu.physics import engine, kinematics as kin, mathx as mx
from dm_control_tpu.physics.model import Model, make_data

IKResult = collections.namedtuple(
    "IKResult", ["qpos", "err_norm", "steps", "success"])

_INVALID_JOINT_NAMES_TYPE = (
    "`joint_names` must be either None, a list, a tuple, or a numpy array; "
    "got {}.")
_REQUIRE_TARGET_POS_OR_QUAT = (
    "At least one of `target_pos` or `target_quat` must be specified.")


def nullspace_method(jac_joints, delta, regularization_strength=0.0):
    """Joint update achieving the end-effector ``delta``
    (reference inverse_kinematics.py:233)."""
    hess_approx = jac_joints.T.dot(jac_joints)
    joint_delta = jac_joints.T.dot(delta)
    if regularization_strength > 0:
        hess_approx += np.eye(hess_approx.shape[0]) * regularization_strength
        return np.linalg.solve(hess_approx, joint_delta)
    return np.linalg.lstsq(hess_approx, joint_delta, rcond=-1)[0]


def qpos_from_site_pose(model: Model,
                        site_name: str,
                        target_pos=None,
                        target_quat=None,
                        joint_names=None,
                        qpos0=None,
                        tol=1e-14,
                        rot_weight=1.0,
                        regularization_threshold=0.1,
                        regularization_strength=3e-2,
                        max_update_norm=2.0,
                        progress_thresh=20.0,
                        max_steps=100):
    """Finds qpos placing a site at a target pose (semantics of the
    reference's qpos_from_site_pose; operates on a Model + initial qpos
    instead of a stateful Physics)."""
    if target_pos is None and target_quat is None:
        raise ValueError(_REQUIRE_TARGET_POS_OR_QUAT)
    m = model
    siteid = m.names.site[site_name]

    if joint_names is None:
        dof_indices = np.arange(m.nv)
    elif isinstance(joint_names, (list, np.ndarray, tuple)):
        dofs = []
        for name in joint_names:
            j = m.names.joint[name]
            adr = m.jnt_dofadr[j]
            from dm_control_tpu.physics.model import JointType

            dofs.extend(range(adr, adr + JointType(m.jnt_type[j]).dof_width))
        dof_indices = np.array(sorted(dofs))
    else:
        raise ValueError(_INVALID_JOINT_NAMES_TYPE.format(type(joint_names)))

    qpos = np.array(qpos0 if qpos0 is not None else np.asarray(m.qpos0),
                    dtype=np.float64)
    d0 = make_data(m)

    def fwd(q):
        d = kin.kinematics(m, d0.replace(qpos=jnp.asarray(q)))
        d = kin.com_pos(m, d)
        return d

    steps = 0
    success = False
    err_norm = 0.0
    for steps in range(max_steps):
        d = fwd(qpos)
        site_xpos = np.asarray(d.site_xpos[siteid])
        site_xmat = np.asarray(d.site_xmat[siteid])
        err_norm = 0.0
        err_parts = []
        if target_pos is not None:
            err_pos = np.asarray(target_pos) - site_xpos
            err_norm += np.linalg.norm(err_pos)
            err_parts.append(err_pos)
        if target_quat is not None:
            site_xquat = np.asarray(mx.mat_to_quat(jnp.asarray(site_xmat)))
            neg = site_xquat * np.array([1.0, -1, -1, -1])
            err_rot_quat = np.asarray(
                mx.quat_mul(jnp.asarray(np.asarray(target_quat, float)),
                            jnp.asarray(neg)))
            err_rot = np.asarray(
                mx.quat_to_axis_angle(jnp.asarray(err_rot_quat)))
            err_norm += np.linalg.norm(err_rot) * rot_weight
            err_parts.append(err_rot)
        if err_norm < tol:
            success = True
            break
        jacp, jacr = kin.jac(m, d, d.site_xpos[siteid],
                             m.site_bodyid[siteid])
        jac_full = []
        if target_pos is not None:
            jac_full.append(np.asarray(jacp))
        if target_quat is not None:
            jac_full.append(np.asarray(jacr))
        jac = np.concatenate(jac_full, axis=0)
        err = np.concatenate(err_parts)
        jac_joints = jac[:, dof_indices]
        reg = (regularization_strength
               if err_norm > regularization_threshold else 0.0)
        update_joints = nullspace_method(jac_joints, err,
                                         regularization_strength=reg)
        update_norm = np.linalg.norm(update_joints)
        if update_norm == 0.0:
            break
        if err_norm / update_norm > progress_thresh:
            break
        if update_norm > max_update_norm:
            update_joints *= max_update_norm / update_norm
        update_nv = np.zeros(m.nv)
        update_nv[dof_indices] = update_joints
        qpos = np.asarray(engine.integrate_pos(
            m, jnp.asarray(qpos), jnp.asarray(update_nv), 1.0))
    return IKResult(qpos=qpos, err_norm=err_norm, steps=steps,
                    success=success)
