"""Test environment: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session, which
pytest guarantees by importing conftest first.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# this image's jax build (axon plugin) keys off JAX_PLATFORM_NAME instead
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
