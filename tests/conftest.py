"""Test config: force CPU JAX with an 8-device virtual mesh.

The multi-chip sharding path (parallel/) is validated on a virtual CPU mesh
per SURVEY §4; `XLA_FLAGS=--xla_force_host_platform_device_count=8` must be
set before jax import.  The persistent compile cache keeps re-runs fast.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

# the axon TPU plugin force-sets jax_platforms='axon,cpu' at import,
# silently overriding the env var -- tests must run on the local CPU
# (8 virtual devices), so override it back explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process/bench-scale)")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def uniform_grid(n: int):
    """Low-discrepancy-ish [0,1) grid for deterministic MC tests."""
    u = (np.arange(n, dtype=np.float64) + 0.5) / n
    v = (np.arange(n, dtype=np.float64) * 0.6180339887498949) % 1.0
    return u.astype(np.float32), v.astype(np.float32)
