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


def test_shift_conv_matches_torch_conv_and_param_tree(rng):
    """ShiftConv (VPU shift-sum lowering for tiny-channel convs, ops/small_conv.py)
    must be a drop-in for TorchConv: identical param tree and matching numerics,
    so RDC checkpoints work under either lowering."""
    from pytorch_nested_unet_tpu.ops.small_conv import ShiftConv

    for k, cin, cout in ((3, 2, 4), (5, 3, 1)):
        x = jnp.asarray(rng.standard_normal((2, 9, 11, cin)), jnp.float32)
        a = TorchConv(cout, k, padding=k // 2, name="c")
        b = ShiftConv(cout, k, padding=k // 2, name="c")
        va = a.init(jax.random.PRNGKey(7), x)
        vb = b.init(jax.random.PRNGKey(7), x)
        # identical tree AND identical init draw (same init fns, same key path)
        assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
        for la, lb in zip(jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        ya = a.apply(va, x)
        yb = b.apply(vb, x)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   atol=1e-5, rtol=1e-5)


def test_conv_bn_relu_conv_impl_variants_agree(rng):
    """ConvBNReLU under mxu vs shift lowering: same param tree, same outputs
    (the shift path must stay checkpoint-compatible with the MXU default)."""
    from pytorch_nested_unet_tpu.models.blocks import ConvBNReLU

    x = jnp.asarray(rng.standard_normal((2, 10, 10, 3)), jnp.float32)
    for k in (3, 5):
        m_ref = ConvBNReLU(4, kernel_size=k, padding=k // 2, conv_impl="mxu")
        m_new = ConvBNReLU(4, kernel_size=k, padding=k // 2, conv_impl="shift")
        v = m_ref.init(jax.random.PRNGKey(0), x, train=True)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(
                    m_new.init(jax.random.PRNGKey(0), x, train=True)))
        out_ref = m_ref.apply(v, x, train=False)
        out_new = m_new.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_new),
                                   atol=1e-5, rtol=1e-5)


def test_rdc_conv_impl_variants_agree(rng):
    """RDC under mxu vs shift lowering: same params, same outputs."""
    from pytorch_nested_unet_tpu.models.rdc import RDC

    x = jnp.asarray(rng.standard_normal((2, 12, 12, 1)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 6, 6, 1)), jnp.float32)
    for decoder in ("GRU", "LSTM", "vanilla"):
        kw = {}
        if decoder == "LSTM":
            kw["c_pre"] = jnp.zeros_like(h)
        m_ref = RDC(1, 3, decoder=decoder, conv_impl="mxu")
        m_new = RDC(1, 3, decoder=decoder, conv_impl="shift")
        v = m_ref.init(jax.random.PRNGKey(0), x, h, **kw)
        out_ref = m_ref.apply(v, x, h, **kw)
        out_new = m_new.apply(v, x, h, **kw)  # same variables restore cleanly
        for a, b in zip(jax.tree_util.tree_leaves(out_ref),
                        jax.tree_util.tree_leaves(out_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
