"""Test config: run on a virtual 8-device CPU mesh (multi-chip sharding tests
compile/execute without real TPU hardware).

Note: the environment's axon sitecustomize force-registers the TPU backend
and overrides JAX_PLATFORMS, so the env var alone is NOT enough — the
platform must be switched via jax.config after import.
"""
import os
import resource

# The XLA-CPU LLVM backend occasionally segfaults compiling the largest
# whole-graph modules (mogwai renderFrame jits) with the default 8 MB main
# stack — deep recursion during instruction selection. The hard limit is
# unlimited here; lift the soft limit before jax loads.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):  # pragma: no cover - restricted sandbox
    pass

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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated XLA:CPU/LLVM state across the suite.

    The flaky LLVM segfault (backend_compile_and_load, always ~70%+ through
    the full run, a different test each time) correlates with hundreds of
    live compiled executables, not with any single module. Dropping the
    in-process caches at module boundaries keeps the resident compiler
    state small; the persistent disk cache makes the recompiles cheap.
    """
    yield
    jax.clear_caches()
