"""Test configuration.

Tests always run on the JAX CPU platform with 8 virtual devices so that
multi-chip sharding paths are exercised without TPU hardware (the
hardware-conditional tier of the reference's test strategy, SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
# Dead-relay proofing (CLAUDE.md env facts): the axon TPU plugin ignores
# JAX_PLATFORMS and dials its relay at plugin registration — with the relay
# dead, the first backend init (even jax.devices("cpu") below) hangs the
# whole suite forever. Tests are CPU-pinned by design, so never let the
# plugin register: scrub its discovery env var unconditionally, the same
# treatment __graft_entry__._degrade_to_cpu_if_relay_dead applies.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Random-weights BiRefNet pipeline tests run against a slim config (the
# full-width model is exercised by the parity/structure tests and on TPU).
os.environ.setdefault("DLIMG_BIREFNET_TEST_SLIM", "1")

import jax
import numpy as np
import pytest

# Belt-and-braces with the env scrub above: even if a plugin slipped in via
# an entry point, restrict backend init to CPU before it first happens.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Pin placement to CPU explicitly so tests are hermetic (the TPU path is
# exercised by bench.py / the driver).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

# Persist compiled test executables across suite runs (keyed on HLO+flags,
# so it can never go stale): the first run pays the compiles (the 8-device
# train-step dominates), later runs load serialized executables. Set via
# jax.config (not env vars): a pytest plugin imports jax before this file.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
