"""Test configuration: run everything on a virtual 8-device CPU mesh.

Standard JAX fake-backend trick (SURVEY.md §4e): tests of pjit/sharding code
run against 8 host devices so multi-chip logic is exercised without TPUs.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


# The machine's sitecustomize registers a TPU backend and re-pins
# JAX_PLATFORMS before conftest runs; the config update below wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs reuse compiled
# executables instead of re-paying single-CPU XLA compile time (the
# fine-tune train step alone compiles for ~4 minutes on one core).  Keyed
# on program + topology + jaxlib version, so correctness is unaffected.
# Must be set via config.update — the env-var path leaves the read side
# uninitialised on this jax version.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
