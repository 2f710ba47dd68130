"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax at interpreter start (to register
the axon TPU plugin), so env vars set here are already too late for jax's
config snapshot — use jax.config.update instead, before any backend
initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses we may spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA:CPU programs across ~25
    modules; with all of them held live, the compile of the large fused
    train-step program in test_train.py segfaulted inside
    backend_compile_and_load three runs in a row (logs/r5_pytest{1,2,4}),
    while the same test passes in isolation in 42 s. Clearing between
    modules bounds the compiler's accumulated state; per-module tests
    share compiles as before."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
