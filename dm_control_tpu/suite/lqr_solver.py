"""Analytic LQR solution (reference: dm_control/suite/lqr_solver.py:28-82).

Discretizes the linear dynamics around qpos=0, solves the discrete
algebraic Riccati equation, and returns the optimal quadratic value and
linear policy.  The mass matrix comes straight from the engine's dense
``Data.qM`` (the reference reconstructs it with ``mj_fullM`` from
MuJoCo's sparse layout).
"""

from __future__ import annotations

import numpy as np


def solve(env):
    """Returns (p, k, beta): value Hessian, policy gain, max eigenvalue of
    the closed loop (reference lqr_solver.py:28-82).

    Raises RuntimeError if the controlled system is unstable.
    """
    import scipy.linalg as scipy_linalg

    m = env.physics.model
    d = env.physics.data
    n = m.nq
    nu = m.nu

    mass = np.asarray(d.qM)

    # joint-space stiffness/damping; jnt_stiffness maps onto dofs 1:1 for
    # the all-hinge LQR model
    stiffness = np.diag(np.asarray(m.jnt_stiffness).ravel())
    damping = np.diag(np.asarray(m.dof_damping).ravel())
    dt = float(np.asarray(m.opt.timestep))

    j = np.linalg.solve(-mass, np.hstack((stiffness, damping)))
    a = np.eye(2 * n) + dt * np.vstack(
        (dt * j + np.hstack((np.zeros((n, n)), np.eye(n))), j))

    b = np.asarray(d.actuator_moment).T
    bc = np.linalg.solve(mass, b)
    b = dt * np.vstack((dt * bc, bc))

    q = np.diag(np.hstack([np.ones(n), np.zeros(n)]))
    r = env.task.control_cost_coef * np.eye(nu)

    p = scipy_linalg.solve_discrete_are(a, b, q, r)
    k = -np.linalg.solve(b.T.dot(p.dot(b)) + r, b.T.dot(p.dot(a)))

    beta = np.abs(np.linalg.eigvals(a + b.dot(k))).max()
    if beta >= 1.0:
        raise RuntimeError("Controlled system is unstable.")
    return p, k, beta
