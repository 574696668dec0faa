"""Test configuration: force an 8-device virtual CPU mesh.

This emulates a TPU slice on CPU so sharding/collective tests run without
hardware (SURVEY.md §4). NOTE: this box's axon sitecustomize registers the
TPU backend in every interpreter and overrides the JAX_PLATFORMS env var, so
we must force the platform through jax.config AFTER import (XLA_FLAGS still
has to be set before the backend initializes).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
