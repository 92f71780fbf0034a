"""Multi-host helpers, exercised in their single-process degenerate forms
(the cross-host semantics ride the same GSPMD machinery the 8-virtual-device
mesh tests cover; see parallel/multihost.py docstring)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from pytorch_nested_unet_tpu.parallel import make_mesh
from pytorch_nested_unet_tpu.parallel.multihost import (
    global_batch_slice, initialize_distributed, make_global_array,
)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False  # no runtime reinit single-host


def test_global_batch_slice_single_process():
    per, offset = global_batch_slice(16)
    assert (per, offset) == (16, 0)


def test_global_batch_slice_multi_process(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    assert global_batch_slice(16) == (4, 8)
    with pytest.raises(ValueError, match="not divisible"):
        global_batch_slice(10)


def test_make_global_array_shards_over_mesh():
    mesh = make_mesh(axis_sizes=(8,), axis_names=("data",))
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_array(local, mesh, PartitionSpec("data", None))
    assert arr.shape == (16, 3)
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(arr), local)
