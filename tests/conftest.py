"""Test env: force an 8-virtual-device CPU mesh.

This box force-registers a remote TPU backend for every Python process (axon
sitecustomize), so `JAX_PLATFORMS=cpu` in the environment is not enough —
select the platform via jax.config before any backend initialization.
Sharding tests then exercise real collectives without TPU hardware
(the TPU analogue of the reference's absent multi-node tests; SURVEY.md §4).
"""

import os

# raise XLA:CPU's 40 s collective-rendezvous abort: the 8 virtual devices
# share one physical core, so sharded steps with minutes of per-shard compute
# (the refine-scale dryrun shapes) would be killed mid-collective otherwise
_flags = ("--xla_cpu_collective_call_terminate_timeout_seconds=3600 "
          "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
if "xla_cpu_collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " " + _flags).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: the test box is a single CPU core, so re-compiles
# dominate wall-clock without it
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/animate3d_tpu/jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
