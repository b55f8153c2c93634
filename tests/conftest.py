"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this conftest
is imported before any test module touches jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the driver env presets axon/TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
