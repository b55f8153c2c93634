"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver environment pins JAX to the axon TPU tunnel via JAX_PLATFORMS;
that wrapper ignores a plain env override, so we clear it and force the
platform through jax.config before any backend initializes.
"""
import os

os.environ.pop("JAX_PLATFORMS", None)
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# separate CPU cache: entries compiled by the remote TPU-host toolchain
# carry CPU features this machine lacks (SIGILL on AOT load)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _check_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
