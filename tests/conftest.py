"""Test config: force CPU jax with 8 virtual devices for sharding tests.

The image's sitecustomize registers an 'axon' TPU backend at interpreter
start and pins JAX_PLATFORMS=axon, so the env var alone is not enough —
we must override jax.config BEFORE the backend is initialized (it is lazy).
Tests must NOT touch the real TPU: it is a single exclusive-access chip
behind a tunnel, and two processes contending for it deadlock.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeated test runs skip recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_metrpo_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU jax"


@pytest.fixture(autouse=True)
def _seed_numpy():
    np.random.seed(0)
    yield
