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
