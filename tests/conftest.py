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

# persistent XLA compile cache: the big jitted step graphs (CTU hydro,
# CTU-CT MHD, shard_map steps) take minutes to compile cold on CPU; warm
# runs load from disk.  Keyed on backend+flags+HLO, so correctness-safe.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
