"""Test environment: force JAX onto CPU with 8 virtual devices so mesh /
sharding tests run without TPU hardware (SURVEY.md §4), and keep torch on CPU
for golden-value parity fixtures."""

import os

# Must be set before jax is imported anywhere.  Hard override: the session
# environment pins JAX_PLATFORMS=axon (single real TPU chip via tunnel), but
# the test suite needs the 8-virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
