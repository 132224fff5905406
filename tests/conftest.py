"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per the standard JAX recipe.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
