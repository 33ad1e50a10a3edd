"""Test configuration.

Tests always run on the JAX CPU platform with 8 virtual devices so that
multi-chip sharding paths are exercised without TPU hardware (the
hardware-conditional tier of the reference's test strategy, SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
