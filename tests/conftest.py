"""Test harness setup: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (tests validate numerics in double precision;
production TPU runs use float32/bfloat16).

jax may already be imported by pytest plugins, but backends initialize
lazily, so jax.config.update + XLA_FLAGS still take effect here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
