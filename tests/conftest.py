"""Test configuration: force the JAX CPU backend with 8 virtual devices.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): sharding/pjit tests run against an 8-device host mesh.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pin JAX_PLATFORMS=axon (the TPU tunnel) through a
# sitecustomize that wins over the env var above; force the CPU backend at
# the config level before any device is touched.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's cost is dominated by XLA-CPU
# compiles of the large train-step graphs; repeat runs hit the cache
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_collection_modifyitems(config, items):
    """Tiered suite (VERDICT r3 weak #5): everything not marked slow or
    heavy is auto-marked ``quick`` — ``pytest -m quick`` is the <10-min
    single-CPU gate; ``-m "not slow"`` adds the heavy parity tests;
    the full suite (incl. slow) is the nightly tier."""
    for item in items:
        if "slow" not in item.keywords and "heavy" not in item.keywords:
            item.add_marker(pytest.mark.quick)
