"""Test harness: force JAX onto a virtual 8-device CPU mesh so sharding and
collectives are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox image pre-imports jax and registers a TPU backend in
# sitecustomize, so env vars alone are too late — override the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mitoflex_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()  # persistent XLA cache: repeat suite runs skip compiles

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running realistic-scale validation"
    )
