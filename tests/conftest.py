"""Test harness: force an 8-device virtual CPU platform before JAX init.

This is the standard TPU-equivalent of multi-node testing without a real
cluster: all sharding/mesh tests run against 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    import jax
    return jax.random.key(0)
