"""Test environment: force JAX onto a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session, which
pytest guarantees by importing conftest first.

``RVA_TEST_PLATFORM=native`` skips the CPU forcing so opt-in hardware runs
(the RVA_SOAK=1 32-stream soak, the live-Kafka gate) execute on the image's
real device instead of the hermetic mesh.
"""

import os

_NATIVE = os.environ.get("RVA_TEST_PLATFORM") == "native"

if not _NATIVE:
    # Force CPU: the TPU image presets JAX_PLATFORMS=axon (the tunneled real
    # chip) and its sitecustomize registers the plugin at interpreter
    # startup, so plain env vars set here are too late — use jax.config too.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _NATIVE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
