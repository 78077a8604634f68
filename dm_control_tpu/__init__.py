"""dm_control_tpu: a TPU-native continuous-control framework.

A from-scratch reimplementation of the capabilities of dm_control
(reference: mhauskn/dm_control) designed for TPUs:

- ``physics``: a batched, jit-compiled rigid-body physics engine in JAX
  (forward kinematics, CRB inertia, RNE bias forces, soft-constraint
  Newton solver) replacing the ctypes MuJoCo bindings
  (reference: dm_control/mujoco/wrapper/).
- ``mjcf``: an MJCF object model and ahead-of-time model compiler that
  turns element trees into static array pytrees
  (reference: dm_control/mjcf/).
- ``rl``: dm_env-style specs and a functional, vmappable environment core
  (reference: dm_control/rl/control.py).
- ``suite``: the benchmark task library (reference: dm_control/suite/).
- ``parallel``: mesh/sharding utilities for multi-host scaling
  (replaces the reference's SubprocVecEnv, dm_control/scripts/vec_env.py).
"""

__version__ = "0.1.0"
