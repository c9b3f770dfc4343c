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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
