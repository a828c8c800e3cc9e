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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
