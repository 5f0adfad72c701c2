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

import jax
import jax._src.xla_bridge as _xb
import numpy as np
import pytest

# This image's sitecustomize registers an "axon" PJRT backend (the real TPU
# via a tunnel) that outranks the CPU backend even under JAX_PLATFORMS=cpu —
# tests must NOT run on the tunnel.  Deregister it before first backend use
# and force the platform selection at the config level (the sitecustomize
# pins jax_platforms=axon, overriding the env var).
_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")

# XLA CPU's default matmul precision is fast-math (~bf16 accuracy); golden
# allclose tests need exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")
# 8 virtual CPU devices for mesh/sharding tests (jax>=0.4.34 API; the old
# --xla_force_host_platform_device_count XLA flag is ignored by jax 0.9)
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
