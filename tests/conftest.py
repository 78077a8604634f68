"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are
exercised without TPU hardware, and with x64 enabled so physics parity
tests can compare against the float64 MuJoCo oracle.
"""

import os

# Must happen before jax is imported anywhere.  (JAX_PLATFORM_NAME is what
# actually overrides the experimental 'axon' TPU-tunnel plugin.)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("MUJOCO_GL", "disabled")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
