"""Test env: force an 8-virtual-device CPU platform before the first backend use.

The container's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon (one real
TPU chip over a tunnel); for the test suite we redirect to a virtual 8-device CPU
mesh via jax.config, which takes effect because no backend has been initialized yet.
Real-TPU benchmarking lives in bench.py, not the tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
