"""HostPrefetchLoader and torch-default initializer statistics."""

import math

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu.data.pipeline import HostPrefetchLoader
from pytorch_nested_unet_tpu.data import SegmentationFolderDataset
from pytorch_nested_unet_tpu.ops.init import (
    torch_bias_init, torch_conv_kernel_init, torch_dense_kernel_init,
)


@pytest.fixture
def folder(tmp_path, rng):
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks" / "0"
    img_dir.mkdir()
    mask_dir.mkdir(parents=True)
    for i in range(10):
        cv2.imwrite(str(img_dir / f"a{i}.png"),
                    rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
        cv2.imwrite(str(mask_dir / f"a{i}.png"),
                    (rng.random((20, 24)) > 0.5).astype(np.uint8) * 255)
    return SegmentationFolderDataset([f"a{i}" for i in range(10)], str(img_dir),
                                     str(tmp_path / "masks"), ".png", ".png", 1)


def test_host_prefetch_loader_streams_batches(folder):
    """Background-thread streaming pipeline: right shapes, drop_last semantics,
    and full coverage without shuffling."""
    loader = HostPrefetchLoader(folder, batch_size=4, size_hw=(16, 16),
                                shuffle=False, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, last short batch dropped
    for imgs, msks, valid in batches:
        assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.uint8
        assert msks.shape == (4, 16, 16, 1) and valid == 4

    loader = HostPrefetchLoader(folder, batch_size=4, size_hw=(16, 16),
                                shuffle=False, drop_last=False, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1][2] == 2  # valid count of the padded final batch


def test_torch_default_init_statistics():
    """kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) — bounds and moments."""
    key = jax.random.PRNGKey(0)
    k = torch_conv_kernel_init(key, (3, 3, 64, 32))
    bound = 1.0 / math.sqrt(3 * 3 * 64)
    arr = np.asarray(k)
    assert arr.min() >= -bound and arr.max() <= bound
    # uniform variance = bound^2/3
    assert np.var(arr) == pytest.approx(bound ** 2 / 3, rel=0.1)

    d = np.asarray(torch_dense_kernel_init(key, (100, 50)))
    b = 1.0 / math.sqrt(100)
    assert d.min() >= -b and d.max() <= b

    bias = np.asarray(torch_bias_init(64)(key, (64,)))
    bb = 1.0 / math.sqrt(64)
    assert bias.min() >= -bb and bias.max() <= bb


def test_orbax_checkpoint_roundtrip(tmp_path):
    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import TrainState, build_optimizer, checkpoint

    m = models.create_model("UNet", num_classes=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=True)
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)
    state = TrainState.create(v, tx)
    checkpoint.save_training_state_orbax(str(tmp_path), state, 7, 0.83, 2)

    v2 = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)), train=True)
    restored = checkpoint.load_training_state_orbax(str(tmp_path),
                                                    TrainState.create(v2, tx))
    assert restored is not None
    s, epoch, best, trig = restored
    assert (epoch, trig) == (7, 2) and best == pytest.approx(0.83)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert checkpoint.load_training_state_orbax(str(tmp_path / "nope"),
                                                TrainState.create(v2, tx)) is None
