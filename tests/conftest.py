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

# Persistent compile cache: the suite's cost is XLA:CPU compile time (tier
# timings in pytest.ini), so warm re-runs deserialize instead of recompiling.
# Safe to fail (degrades to cold compiles). CI should cache this directory.
try:
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".pytest_jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
