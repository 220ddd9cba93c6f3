"""Test environment: force an 8-device virtual CPU mesh.

The container's sitecustomize registers an 'axon' TPU PJRT plugin and pins
JAX_PLATFORMS=axon at interpreter start, so plain env vars are not enough —
we flip the platform through jax.config before the first backend init.
Multi-chip sharding is validated on these virtual CPU devices; the real-TPU
path is exercised by bench.py and __graft_entry__.py instead.
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
# Parity tests compare against torch float32; keep matmuls in full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert len(jax.devices()) == 8
