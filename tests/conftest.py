"""Test harness: 8 virtual CPU devices + CPU as the default device.

This is the standard TPU-equivalent of multi-node testing without a real
cluster: all sharding/mesh tests run against 8 virtual CPU devices.

Note: this machine's TPU registers through the experimental 'axon'
plugin which ignores ``JAX_PLATFORMS=cpu``, so tests force CPU via
``jax_default_device`` instead (the TPU would otherwise run f32 matmuls
in bf16 and break parity tolerances).  Mesh tests must request
``jax.devices("cpu")`` explicitly.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.key(0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


# The package logger runs with propagate=False in production (it must
# not leak through an embedding app's root-logger policy); pytest's
# caplog captures via root propagation, so re-enable it for tests.
from sasvqa_tpu.core.logging import LOGGER as _SASVQA_LOGGER  # noqa: E402
_SASVQA_LOGGER.propagate = True
