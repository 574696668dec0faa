"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

This emulates a TPU slice on CPU so sharding/collective tests run without
hardware (SURVEY.md §4). All tests run on CPU for determinism and speed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
