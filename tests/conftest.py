"""Test harness: force the CPU platform with an 8-device virtual mesh.

The axon sitecustomize force-registers the TPU plugin and overrides
JAX_PLATFORMS programmatically, so the env var alone is not enough — we must
update jax.config before any backend is initialized.  8 virtual CPU devices
is the standard way to test N-chip sharding without a pod (SURVEY §4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20150415)
