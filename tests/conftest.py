"""Test env: force CPU JAX with 8 virtual devices so pjit/shard_map/collective
paths are exercised without TPU hardware (standard JAX testing pattern).

Note: this container boots an 'axon' TPU PJRT plugin from sitecustomize before
pytest starts, so JAX_PLATFORMS env vars set here are too late — use
jax.config, which works post-import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # XLA_FLAGS fallback above covers older jax

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(123)
