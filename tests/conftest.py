"""Test config: run every test on a virtual 8-device CPU mesh so sharding code
is exercised without TPU hardware. Must configure before any jax computation.

Note: the ambient environment exports JAX_PLATFORMS=axon (TPU tunnel) which
overrides env-var attempts to select CPU, so we force it via jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
