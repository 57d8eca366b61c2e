"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

All unit tests run on the CPU backend (fast, deterministic); multi-device
tests see 8 virtual devices via --xla_force_host_platform_device_count.

Note: the axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so we must use jax.config.update *before* any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: repeated suite runs skip the big CPU compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
