"""Test config: run on a virtual 8-device CPU mesh (multi-chip sharding tests
compile/execute without real TPU hardware).

Note: the environment's axon sitecustomize force-registers the TPU backend
and overrides JAX_PLATFORMS, so the env var alone is NOT enough — the
platform must be switched via jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# persistent XLA compile cache: the 1-core CPU runner spends minutes
# recompiling identical programs otherwise
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rtsdm_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
