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


def pytest_collection_modifyitems(config, items):
    """tag whole-graph integration files as `slow` so the fast unit core
    (`pytest -m "not slow"`, ~3 min) works as a pre-commit gate; the full
    suite compiles the joint train/inference graph repeatedly and takes
    >10 CPU-minutes."""
    slow_files = {
        "test_train_step.py",
        "test_trainer_multidevice.py",
        "test_parallel.py",
        "test_inference.py",
        "test_batched_inference.py",
        "test_config_and_dtypes.py",
        "test_export.py",
        "test_full_graph_parity.py",
        "test_evaluation.py",
        "test_diagnostics.py",
        "test_examples.py",
        "test_multihost.py",
    }
    for item in items:
        if item.fspath.basename in slow_files:
            item.add_marker(pytest.mark.slow)
