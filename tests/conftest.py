"""Test config: force an 8-virtual-device CPU backend.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``) — the JAX-native fake backend
for testing meshes without a pod. Must run before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var JAX_PLATFORMS is overridden by the axon TPU plugin on this
# machine; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
