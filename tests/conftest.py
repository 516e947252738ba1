"""Test env: run everything on an 8-virtual-device CPU mesh so sharding tests
exercise real collectives without TPU hardware (the TPU analogue of the
reference's absent multi-node tests; SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# persistent compile cache: the test box is a single CPU core, so re-compiles
# dominate wall-clock without it
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_animate3d")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
