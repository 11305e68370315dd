"""Test harness: force an 8-virtual-device CPU platform so sharding tests run
without a TPU slice (SURVEY.md §4).

Note: in this environment the JAX_PLATFORMS env var is ignored by the axon
TPU plugin; jax.config.update('jax_platforms', ...) before first backend use
is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("WST_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
