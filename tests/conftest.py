"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY §4: the same jitted code that runs on TPU runs on the CPU backend
in CI, which is how we test TPU code without a TPU. Must set env vars before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
