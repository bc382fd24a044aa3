"""test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes, so multi-chip sharding tests run anywhere (the real TPU chip is
reserved for bench.py)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the env var alone is not honored when a TPU PJRT plugin is installed;
# the config update is.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
