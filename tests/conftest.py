"""Test config: run JAX on CPU with 8 virtual devices.

This is the idiomatic TPU answer to "test distributed without a cluster"
(SURVEY.md §4): multi-device sharding tests run on a fake 8-device CPU mesh via
--xla_force_host_platform_device_count. Must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# JAX's "default" conv/matmul precision permits bf16-grade accumulation (the right
# call on TPU MXU for speed, wrong for parity assertions). Pin tests to exact f32.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
