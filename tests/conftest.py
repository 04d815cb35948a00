"""Test harness: force JAX onto a virtual 8-device CPU platform so that
multi-chip sharding (pjit over a Mesh) is exercised without TPU hardware,
per SURVEY.md §4's test plan."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off any tunneled TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# the axon sitecustomize hook sets jax_platforms="axon,cpu" via jax.config,
# which outranks the env var — force CPU through the same channel
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
