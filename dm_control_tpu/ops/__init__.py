"""Pallas TPU kernels for the engine's hot dense ops."""

from dm_control_tpu.ops.linalg import chol_solve  # noqa: F401
