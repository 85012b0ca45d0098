"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the tunneled 'axon' TPU
backend in every process (and JAX_PLATFORMS=axon is in the env), so the
env-var idiom alone is not enough — we must also override the jax config
after import.  SURVEY.md §4: the 8-fake-CPU-device mesh is the JAX idiom
replacing a fake NCCL backend.

Tiering (pytest.ini markers):
  - ``pytest -m fast``          — small-host health check (<5 min on 1 CPU)
  - ``pytest -m heavy``         — big XLA-CPU compiles / e2e pipelines
  - ``pytest -m multidevice``   — executes 8-virtual-device collectives.
    On hosts with few cores XLA's in-process CPU communicator deadlocks
    (pool threads < collective participants; see PARALLELISM.md), so
    these auto-skip below _MULTIDEVICE_MIN_CORES with an explicit reason.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # The concurrency-optimized thunk scheduler deadlocks in-process CPU
    # collectives when pool threads < participants (CLAUDE.md); tests
    # don't need its throughput, so turn it off unconditionally.
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Module-level tier assignment; unlisted modules default to ``fast``.
# Individual tests may carry an explicit marker to override their module.
_HEAVY_MODULES = {
    "test_bf16",
    "test_cli",
    "test_compat_vq",
    "test_convergence_toy",
    "test_convert_eval_pipeline",
    "test_ecapa",
    "test_ecapa_fidelity",
    "test_generator_fastpaths",
    "test_hubert",
    "test_kernels",
    "test_layers_torch_parity",
    "test_mel",
    "test_models",
    "test_msd_fused",
    "test_quantizer_trainer",
    "test_reference_model_parity",
    "test_streaming",
    "test_train_infer",
    "test_vocoder_pipeline",
    "test_whisper",
    "test_yaapt",
    "test_yaapt_real_speech",
}

# Tests (module, name-prefix) that run 8-device collectives for real.
_MULTIDEVICE_TESTS = {
    ("test_parallel", "test_training_equivalent_on_1_and_8_devices"),
    ("test_parallel", "test_vq_codebook_identical_across_shardings"),
    ("test_parallel", "test_gan_step_equivalent_on_1_and_8_devices"),
}

_MULTIDEVICE_MIN_CORES = 4


def _usable_cores() -> int:
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def pytest_collection_modifyitems(config, items):
    few_cores = _usable_cores() < _MULTIDEVICE_MIN_CORES
    skip_multi = pytest.mark.skip(
        reason=(
            f"multidevice test needs >= {_MULTIDEVICE_MIN_CORES} cores "
            f"(host has {_usable_cores()}): XLA's in-process CPU communicator "
            "starves when pool threads < collective participants "
            "(blocking collective thunks on the shared Eigen pool)"
        )
    )
    for item in items:
        module = item.module.__name__ if item.module else ""
        base_name = item.name.split("[")[0]
        if (module, base_name) in _MULTIDEVICE_TESTS:
            item.add_marker(pytest.mark.multidevice)
            if few_cores:
                item.add_marker(skip_multi)
        elif module in _HEAVY_MODULES:
            item.add_marker(pytest.mark.heavy)
        else:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
