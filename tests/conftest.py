"""Test configuration: force CPU with 8 virtual devices so sharding tests run
fast and without TPU hardware.

The container's sitecustomize registers and eagerly initializes the axon TPU
PJRT plugin at interpreter start, so env vars alone are too late — we switch
the platform in-process and clear the initialized backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.clear_backends()
except AttributeError:
    from jax.extend import backend as _jeb
    _jeb.clear_backends()
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long e2e tests (skip with -m 'not slow' for a quick pass)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
