"""Test configuration: force a virtual 8-device CPU mesh before JAX import.

Multi-chip sharding tests run against `--xla_force_host_platform_device_count`
CPU devices standing in for a TPU slice, per the build plan (SURVEY.md §4).
"""

import os

# Force CPU: the session environment may pin JAX to a TPU tunnel backend
# ("axon", imported by sitecustomize before any user code — so the env var
# alone is not enough; the config must also be updated post-import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402

# The driver/panorama/multihost e2e tests dominate the suite's wall time
# (rendered captures through the full pipeline). They are auto-marked
# `slow` so `pytest -m "not slow"` is the quick iteration tier; the full
# pyramid still runs by default.
_SLOW_MODULES = {
    "test_driver", "test_panorama", "test_multihost", "test_colmap_driver",
    "test_driver_mesh",
}
_SLOW_NAMES = ("pipeline_to_evaluator",)


def pytest_collection_modifyitems(items):
    for item in items:
        mod = item.module.__name__ if item.module else ""
        if mod in _SLOW_MODULES or any(s in item.name for s in _SLOW_NAMES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_compile_cache():
    """Clear JAX's in-process caches after every test module.

    A monolithic `pytest tests/` run accumulates ~140 tests' worth of
    compiled executables across 8 virtual devices in one process; round 4's
    full run died ~29 min in with a fatal native error during a BA pjit
    compile (VERDICT r4 weak #5). Dropping the compilation cache at module
    boundaries bounds the per-process footprint; recompiles within a module
    are unaffected."""
    yield
    jax.clear_caches()
