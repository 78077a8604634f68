"""Batched TPU-native rigid-body physics engine.

This package replaces the reference's native MuJoCo engine + ctypes wrapper
(reference: dm_control/mujoco/wrapper/, external libmujoco200.so) with a pure
JAX implementation designed for lockstep batched simulation under one jit:

- ``model``: ``Model``/``Data`` pytrees (the analogues of mjModel/mjData).
- ``mathx``: quaternion / rotation / spatial (6D) algebra.
- ``kinematics``: forward kinematics over the body tree.
- ``inertia``: composite-rigid-body mass matrix and factorization.
- ``dynamics``: recursive Newton-Euler bias forces, passive forces.
- ``collision``: static-pair broadphase + primitive narrowphase.
- ``constraints``: soft-constraint row assembly (limits/contacts/equality).
- ``solver``: MuJoCo-style projected Newton solver.
- ``engine``: ``step``/``forward`` entry points and the ``Physics`` facade.
"""

from dm_control_tpu.physics.model import Data  # noqa: F401
from dm_control_tpu.physics.model import Model  # noqa: F401
