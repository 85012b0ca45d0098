"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the tunneled 'axon' TPU
backend in every process (and JAX_PLATFORMS=axon is in the env), so the
env-var idiom alone is not enough — we must also override the jax config
after import.  SURVEY.md §4: the 8-fake-CPU-device mesh is the JAX idiom
replacing a fake NCCL backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
