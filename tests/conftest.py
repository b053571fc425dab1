"""Test env: force an 8-device virtual CPU mesh BEFORE jax initializes.

Multi-device sharding tests run on faked host devices (the standard JAX
answer to testing multi-chip code without a cluster).
"""

import os

# Force the CPU backend: the host environment pins JAX_PLATFORMS to the TPU
# plugin (where f32 matmuls default to bf16 MXU precision — numerics tests
# need exact f32), and its sitecustomize initializes jax before conftest
# runs, so the env var route is dead — jax.config is the only lever that
# still works. 8 virtual devices for the sharding tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Free compiled XLA executables at module boundaries.

    The full suite compiles hundreds of CPU programs in one process; once it
    grew past ~200 tests, XLA's CPU backend started segfaulting inside
    backend_compile_and_load near the END of the run (reproducibly at
    ~test 180 of 216, 2026-08-19; any sub-span of the suite passes —
    test_val_loop alone and the last 13 files together are green). Dropping
    executables each module caps live JIT'd code. Within-module caching —
    what module-scoped fixtures rely on for speed — is untouched; a
    re-traced call after the clear just recompiles.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()
