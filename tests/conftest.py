"""Test config: run JAX on CPU with 8 virtual devices.

This is the idiomatic TPU answer to "test distributed without a cluster"
(SURVEY.md §4): multi-device sharding tests run on a fake 8-device CPU mesh.
All config updates must happen before jax initializes a backend.
"""

import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

import jax
import numpy as np
import pytest

# This machine's sitecustomize pins jax_platforms to the axon TPU plugin, which
# overrides the JAX_PLATFORMS env var — force CPU via the config API instead
# (must happen before first backend use).
jax.config.update("jax_platforms", "cpu")
# JAX's "default" conv/matmul precision permits bf16-grade accumulation (the right
# call on TPU MXU for speed, wrong for parity assertions). Pin tests to exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
# 8 virtual CPU devices for mesh tests (jax>=0.4.34 replaces the
# --xla_force_host_platform_device_count XLA flag with this config option).
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the suite's model compiles dominate its ~45 min
# wall time on this 1-core box; identical test shapes recur across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                                 os.path.expanduser("~/.jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
