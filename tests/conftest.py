"""Test configuration: CPU backend with 8 virtual devices and x64 enabled.

Multi-host/multi-chip sharding tests run on a virtual CPU mesh since the
reference offers no distributed fixture to imitate (SURVEY.md §4).

PSBA_TEST_TPU=1 keeps the real TPU backend instead, so the Pallas
kernels run Mosaic-compiled rather than in interpret mode — CPU-only CI
cannot catch Mosaic lowering regressions (layout, VMEM budget, 64-bit
types; see tests/test_x64_kernels.py). Intended for the kernel test
files (test_linalg, test_pallas, test_x64_kernels); the committed
on-TPU run log is TPU_TESTLOG_r05.txt."""

import os

TEST_TPU = os.environ.get("PSBA_TEST_TPU", "") == "1"

if not TEST_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not TEST_TPU:
    # A TPU plugin may have been force-registered by a sitecustomize
    # before this conftest runs (overriding JAX_PLATFORMS); the config
    # update below wins as long as no backend has been initialized yet.
    jax.config.update("jax_platforms", "cpu")
else:
    try:  # compile cache: repeat on-TPU test runs skip recompiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:
        pass
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA = "/root/reference/data"


def has_data() -> bool:
    return os.path.isdir(DATA)


requires_data = pytest.mark.skipif(
    not has_data(), reason="reference datasets not mounted"
)


@pytest.fixture(scope="session")
def prob7():
    """7 cameras, varK intrinsics, 465 points — the mid-size unit fixture."""
    from psba_tpu.io import load_problem

    return load_problem(f"{DATA}/7camsvarK.txt", f"{DATA}/7pts.txt")


@pytest.fixture(scope="session")
def prob54():
    """54 cameras varKD (distortion parsed+dropped), 5207 points."""
    from psba_tpu.io import load_problem

    return load_problem(f"{DATA}/54camsvarKD.txt", f"{DATA}/54pts.txt")


@pytest.fixture(scope="session")
def prob_synth():
    from psba_tpu.io import synthetic_problem

    return synthetic_problem(n_cams=6, n_pts=150, seed=3)
