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

# Persistent compilation cache: this box is single-core and XLA compiles
# dominate test wall-clock; cache across sessions.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" (TPU tunnel)
# regardless of env; override back to CPU for the test mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
