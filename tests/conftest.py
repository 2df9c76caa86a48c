"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the TPU-native analog of a fake distributed backend (SURVEY.md §4):
all sharding/collective tests run against 8 virtual CPU devices so they work
anywhere, while the real-chip path is exercised by bench.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU-tunnel sitecustomize imports jax at interpreter start, so env vars
# alone are too late — force the platform through jax.config before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = os.environ.get("SVTSG_REFERENCE_ROOT", "/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    return REFERENCE_ROOT


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
