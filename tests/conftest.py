"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run without TPU hardware (SURVEY.md §4 strategy (d)).

NB: this environment's sitecustomize registers an 'axon' TPU backend and
force-sets jax_platforms='axon,cpu', so the JAX_PLATFORMS env var alone is
not enough — the config must be updated after importing jax (before any
backend is initialized).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: large-shape tests (several minutes on CPU)")
