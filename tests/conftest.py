"""Test harness config (SURVEY.md §4.2).

Forces the CPU platform with 8 virtual devices BEFORE any test imports jax,
so distributed tests (shard_map over a Mesh) run without TPU hardware.

Note: the environment's axon TPU plugin force-prepends itself to
``jax_platforms`` (plain ``JAX_PLATFORMS=cpu`` is overridden), so we must
set the config value after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
