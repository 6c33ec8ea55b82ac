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
