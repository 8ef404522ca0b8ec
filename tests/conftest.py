"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU) and its
sitecustomize imports jax BEFORE pytest loads this file, so setting env vars
alone is not enough — jax.config.update("jax_platforms", ...) is what
actually forces the CPU backend after import (backends initialize lazily,
so XLA_FLAGS set here is still honored for the device count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable caches after every test module.

    The full suite accumulates hundreds of interpret-mode Pallas programs
    and CPU XLA executables in one process; past ~285 tests that state
    made the CPU client segfault (observed in tests/test_serve.py when run
    after the whole alphabet of kernel tests, 2026-08).  Per-module cache
    clearing bounds the accumulation; module-scoped fixtures re-jit at
    worst once per module."""
    yield
    jax.clear_caches()
