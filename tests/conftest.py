"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware via
xla_force_host_platform_device_count (SURVEY.md §4). Must run before the
first jax import anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: shell exports axon (TPU)

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (TPU tunnel)
# regardless of env; override back to CPU for the test mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this box is single-core and XLA compiles
# dominate test wall-clock; cache across sessions. MUST go through
# jax.config.update, not env vars: the axon sitecustomize imports jax at
# interpreter start, so jax captures its env-var config defaults BEFORE this
# conftest runs — JAX_COMPILATION_CACHE_DIR set here was silently ignored
# (the round-3 suite re-paid every CPU compile; VERDICT r3 weak item 4).
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            "/root/repo/.jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# 0.0, not the usual 0.1: profiling test_rows_pipeline showed ~530 sub-100ms
# compiles (op-by-op dispatches + small helper jits) re-compiled EVERY run
# (~12s/file) because the 0.1s threshold excluded them from the cache.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module", autouse=True)
def _fresh_jax_caches():
    """Clear jax's in-process caches between test modules.

    A single suite process accumulates hundreds of live jaxprs/executables;
    tracing and dispatch slow down super-linearly as they pile up (measured:
    test_rows_pipeline[0.0] runs 20s in a fresh process vs 38s mid-suite).
    Re-compiles after a clear are disk hits in the persistent cache (the
    0.0s threshold above caches every program), so clearing at module
    boundaries trades a few cheap deserializes for fast traces throughout.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
