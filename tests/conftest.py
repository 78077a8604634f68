"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (so sharding paths are
exercised without TPU hardware) and with x64 enabled (so physics parity
tests can compare against the float64 MuJoCo oracle).

The session environment pre-registers the 'axon' TPU-tunnel PJRT plugin at
*interpreter startup* (via sitecustomize), so the default backend cannot be
changed here — instead the default *device* is pinned to CPU.  The CPU
client initializes lazily, so the XLA_FLAGS virtual-device-count flag set
below still takes effect.
"""

import os

os.environ.setdefault("MUJOCO_GL", "disabled")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the heavyweight domain steps (humanoid, dog,
# quadruped) dominate test wall time on first compile; cached reruns are
# seconds (cache is keyed on HLO, so code changes invalidate naturally)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 3)
_CPU_DEVICES = jax.local_devices(backend="cpu")
assert len(_CPU_DEVICES) >= 8, _CPU_DEVICES
jax.config.update("jax_default_device", _CPU_DEVICES[0])


def cpu_mesh_devices():
    """The virtual CPU devices available for sharding tests."""
    return _CPU_DEVICES


# -- test tiers ---------------------------------------------------------------
# quick tier: the unit-level modules that run < 60s with a warm compile
# cache — the inner development loop (`pytest -m quick`).  Everything
# else (oracle parity, suite contracts, training loops) is the CI gate.
_QUICK_MODULES = {
    "test_containers", "test_mathx", "test_transformations",
    "test_rewards", "test_schema", "test_named_index", "test_mjcf_utils",
    "test_mjcf_bind", "test_viewer",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "").rsplit(".", 1)[-1]
        if name in _QUICK_MODULES:
            item.add_marker(_pytest.mark.quick)
