"""Test configuration.

Tests run on CPU with an 8-device virtual mesh — the JAX-native "fake
backend" for exercising pjit/sharding paths without TPU hardware
(SURVEY.md §4: the reference never tests distributed paths; we do).

Note: the axon TPU plugin ignores JAX_PLATFORMS, so the platform must be
forced through jax.config before first backend use.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles the same tiny model
# graphs every run; caching them on disk cuts repeat-run wall time
# substantially on the 1-vCPU CI host.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("VTPU_TEST_CACHE", "/tmp/vtpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.7)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _seed_prng():
    # RNG isolation (reference test/conftest.py:101 prevent_leaking_rng).
    # torch's global RNG is seeded too (when torch is loaded): oracle
    # tests draw torch-initialized weights, and without this their values
    # depend on which torch-using tests ran earlier — tolerance-margin
    # tests then pass or fail based on test *selection*.
    import sys

    np.random.seed(0)
    torch = sys.modules.get("torch")
    if torch is not None:
        torch.manual_seed(0)
    yield
