"""Parity of conv / pooling / BN primitives against PyTorch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pytorch_nested_unet_tpu.ops import (
    TorchConv, TorchConvTranspose, BatchNorm,
    max_pool2x2, adaptive_avg_pool, adaptive_max_pool,
)


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


@pytest.mark.parametrize("cin,cout,k,s,p,d,g", [
    (3, 8, 3, 1, 1, 1, 1),    # VGGBlock conv
    (8, 4, 1, 1, 0, 1, 1),    # 1x1 head
    (6, 6, 5, 1, 2, 1, 1),    # score block conv5x5
    (4, 8, 3, 2, 1, 1, 1),    # strided
    (8, 8, 3, 1, 2, 2, 1),    # dilated (CascadePSP trunk)
    (8, 8, 3, 1, 1, 1, 8),    # depthwise (GhostModule cheap conv)
])
def test_conv_matches_torch(rng, cin, cout, k, s, p, d, g):
    x = rng.standard_normal((2, 13, 11, cin), dtype=np.float32)
    tconv = tnn.Conv2d(cin, cout, k, stride=s, padding=p, dilation=d, groups=g)
    layer = TorchConv(cout, k, stride=s, padding=p, dilation=d, groups=g)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # Copy torch weights: (cout, cin/g, kh, kw) -> (kh, kw, cin/g, cout)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"conv": {"kernel": jnp.asarray(w),
                                  "bias": jnp.asarray(tconv.bias.detach().numpy())}}}
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    ref = _nhwc(tconv(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_conv_init_distribution():
    # PyTorch Conv2d default: U(±1/sqrt(fan_in)).
    layer = TorchConv(64, 3, padding=1)
    params = layer.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 32)))
    w = np.asarray(params["params"]["conv"]["kernel"])
    bound = 1.0 / np.sqrt(3 * 3 * 32)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.9 * bound
    assert abs(w.mean()) < 0.1 * bound


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (4, 2, 1), (3, 2, 1)])
def test_conv_transpose_matches_torch(rng, k, s, p):
    cin, cout = 6, 4
    x = rng.standard_normal((2, 7, 9, cin), dtype=np.float32)
    tconv = tnn.ConvTranspose2d(cin, cout, k, stride=s, padding=p)
    layer = TorchConvTranspose(cout, k, stride=s, padding=p)
    # torch weight (cin, cout, kh, kw) -> flax transpose_kernel (kh, kw, cout, cin)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"conv": {"kernel": jnp.asarray(w),
                                  "bias": jnp.asarray(tconv.bias.detach().numpy())}}}
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    ref = _nhwc(tconv(_nchw(x)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_max_pool2x2_matches_torch(rng):
    for hw in [(8, 8), (7, 9)]:  # odd sizes exercise floor mode
        x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
        ours = np.asarray(max_pool2x2(jnp.asarray(x)))
        ref = _nhwc(F.max_pool2d(_nchw(x), 2))
        np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("out_hw", [(1, 1), (2, 3), (3, 3), (6, 6), (5, 7)])
def test_adaptive_pools_match_torch(rng, out_hw):
    x = rng.standard_normal((2, 12, 14, 3), dtype=np.float32)
    ours_avg = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    ref_avg = _nhwc(F.adaptive_avg_pool2d(_nchw(x), out_hw))
    np.testing.assert_allclose(ours_avg, ref_avg, atol=1e-5, rtol=1e-5)
    ours_max = np.asarray(adaptive_max_pool(jnp.asarray(x), out_hw))
    ref_max = _nhwc(F.adaptive_max_pool2d(_nchw(x), out_hw))
    np.testing.assert_allclose(ours_max, ref_max, atol=1e-6)


def test_batchnorm_matches_torch_train_and_eval(rng):
    c = 5
    x1 = rng.standard_normal((4, 6, 6, c), dtype=np.float32)
    x2 = rng.standard_normal((4, 6, 6, c), dtype=np.float32)
    tbn = tnn.BatchNorm2d(c)  # momentum 0.1, eps 1e-5

    layer = BatchNorm()
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x1), use_running_average=False)

    # two train steps: outputs + running-stat updates must track torch
    tbn.train()
    for x in (x1, x2):
        ref = _nhwc(tbn(_nchw(x)))
        ours, mutated = layer.apply(variables, jnp.asarray(x), use_running_average=False,
                                    mutable=["batch_stats"])
        variables = {"params": variables.get("params", {}), "batch_stats": mutated["batch_stats"]}
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)

    # running stats: torch-EXACT semantics — the running-var EMA applies the
    # unbiased n/(n-1) correction (torch BatchNorm2d), unlike flax nn.BatchNorm
    # which feeds the biased variance into the EMA. Pinned tight so a
    # regression to flax semantics (factor 1.007 at n=144) fails.
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.detach().numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["bn"]["var"]),
        tbn.running_var.detach().numpy(), atol=1e-6, rtol=1e-5)

    # eval mode
    tbn.eval()
    ref = _nhwc(tbn(_nchw(x1)))
    ours = layer.apply(variables, jnp.asarray(x1), use_running_average=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)
