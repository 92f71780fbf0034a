"""CA-Net helper blocks vs the REFERENCE'S OWN classes (archs.py:101-842).

Full-model CA-Net forward parity against the reference is impossible by
construction: at its only valid input size (224x300, hardcoded SE pool
windows archs.py:614-628) the reference's UpCat pads a width mismatch with
`torch.rand` garbage at forward time (archs.py:585-590), so its output is
nondeterministic. What CAN be pinned — and is, here — is every attention /
SE / scale-fusion building block, runtime-imported from the reference and
compared against this framework's module with the identical weights:

  - MultiAttentionBlock + GridAttentionBlock2D (archs.py:101-285)
  - NONLocalBlock2D embedded_gaussian w/ sub_sample (archs.py:286-570)
  - SE_Conv_Block dual avg/max channel SE (archs.py:597-686), at 224x300
    where the reference's hardcoded pool window == our global pooling
  - scale_atten_convblock / ChannelGate / SpatialAtten (archs.py:712-842)
  - UpCat deconv (archs.py:571-593, mismatch-free sizes)
  - UnetDsv3 (archs.py:687-694)

Weight mapping is explicit per block (the CA-Net families mix flax
nn.BatchNorm and ops.layers.BatchNorm scopes, Linear MLPs and a transposed
conv, so the mechanical converter does not apply).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from pytorch_nested_unet_tpu.models.canet import (
    MultiAttentionBlock, NonLocalBlock2D, ScaleAttenConvBlock, SEConvBlock,
    UnetDsv3, UpCat,
)

from test_attention_reference_parity import REF, _import_reference_archs

pytestmark = [
    pytest.mark.slow,  # multi-minute: see pyproject fast lane
    pytest.mark.skipif(not torch.__version__, reason="torch required"),
]


def _nchw(a):
    return torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _arr(sd, k):
    return np.asarray(sd[k].detach().numpy(), np.float32)


def _cw(sd, k):
    """torch conv OIHW (or deconv IOHW) -> flax HWIO (or HWOI)."""
    return _arr(sd, k).transpose(2, 3, 1, 0)


def _conv(sd, p, bias=True):
    d = {"kernel": _cw(sd, p + ".weight")}
    if bias:
        d["bias"] = _arr(sd, p + ".bias")
    return {"conv": d}


def _dense(sd, p):
    return {"dense": {"kernel": _arr(sd, p + ".weight").T,
                      "bias": _arr(sd, p + ".bias")}}


def _bn_p(sd, p):
    return {"scale": _arr(sd, p + ".weight"), "bias": _arr(sd, p + ".bias")}


def _bn_s(sd, p):
    return {"mean": _arr(sd, p + ".running_mean"),
            "var": _arr(sd, p + ".running_var")}


def _randomize_all(tm, seed=1):
    """Non-trivial weights AND BN statistics everywhere (the reference
    zero-inits the non-local W, which would make its branch vanish)."""
    nprng = np.random.default_rng(seed)
    with torch.no_grad():
        for k, t in tm.state_dict().items():
            if "num_batches_tracked" in k:
                continue
            if k.endswith("running_var"):
                vals = nprng.uniform(0.5, 1.5, tuple(t.shape))
            else:
                vals = nprng.uniform(-0.5, 0.5, tuple(t.shape))
            t.copy_(torch.tensor(vals, dtype=torch.float32))


def test_multi_attention_block_matches_reference(rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.MultiAttentionBlock(in_size=8, gate_size=16, inter_size=8,
                                 nonlocal_mode="concatenation",
                                 sub_sample_factor=(1, 1)).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    def gate(g):
        return {
            "theta": _conv(sd, f"{g}.theta"),
            "phi": _conv(sd, f"{g}.phi"),
            "psi": _conv(sd, f"{g}.psi"),
            "W_conv": _conv(sd, f"{g}.W.0"),
            "W_bn": {"bn": _bn_p(sd, f"{g}.W.1")},
        }

    variables = {
        "params": {
            "gate_block_1": gate("gate_block_1"),
            "gate_block_2": gate("gate_block_2"),
            "combine_conv": _conv(sd, "combine_gates.0"),
            "combine_bn": {"bn": _bn_p(sd, "combine_gates.1")},
        },
        "batch_stats": {
            "gate_block_1": {"W_bn": {"bn": _bn_s(sd, "gate_block_1.W.1")}},
            "gate_block_2": {"W_bn": {"bn": _bn_s(sd, "gate_block_2.W.1")}},
            "combine_bn": {"bn": _bn_s(sd, "combine_gates.1")},
        },
    }

    jm = MultiAttentionBlock(inter_channels=8, nonlocal_mode="concatenation",
                             sub_sample_factor=(1, 1))
    x = rng.standard_normal((2, 24, 30, 8)).astype(np.float32)
    g = rng.standard_normal((2, 12, 15, 16)).astype(np.float32)
    with torch.no_grad():
        t_out, t_att = tm(_nchw(x), _nchw(g))
    out, att = jm.apply(variables, jnp.asarray(x), jnp.asarray(g), train=False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), atol=5e-5)
    np.testing.assert_allclose(np.asarray(att), _nhwc(t_att), atol=5e-5)


def test_nonlocal_block_matches_reference(rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.NONLocalBlock2D(in_channels=16, inter_channels=4).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    variables = {
        "params": {
            "g": _conv(sd, "g.0"),
            "theta": _conv(sd, "theta"),
            "phi": _conv(sd, "phi.0"),
            "W_conv": _conv(sd, "W.0"),
            "W_bn": _bn_p(sd, "W.1"),
        },
        "batch_stats": {"W_bn": _bn_s(sd, "W.1")},
    }

    jm = NonLocalBlock2D(inter_channels=4, mode="embedded_gaussian",
                         sub_sample_factor=2)
    x = rng.standard_normal((2, 12, 14, 16)).astype(np.float32)
    with torch.no_grad():
        expect = _nhwc(tm(_nchw(x)))
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


def test_se_conv_block_matches_reference_at_224x300(rng):
    """planes=16 puts the reference on its hardcoded (224,300) pool window
    (archs.py:614-616) — the size where our global pooling is the same op."""
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.SE_Conv_Block(32, 16).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    variables = {
        "params": {
            "conv1": _conv(sd, "conv1", bias=False),
            "bn1": {"bn": _bn_p(sd, "bn1")},
            "conv2": _conv(sd, "conv2", bias=False),
            "bn2": {"bn": _bn_p(sd, "bn2")},
            "downchannel_conv": _conv(sd, "downchannel.0", bias=False),
            "downchannel_bn": {"bn": _bn_p(sd, "downchannel.1")},
            "fc1": _dense(sd, "fc1"),
            "fc2": _dense(sd, "fc2"),
            "conv3": _conv(sd, "conv3", bias=False),
            "bn3": {"bn": _bn_p(sd, "bn3")},
        },
        "batch_stats": {
            "bn1": {"bn": _bn_s(sd, "bn1")},
            "bn2": {"bn": _bn_s(sd, "bn2")},
            "downchannel_bn": {"bn": _bn_s(sd, "downchannel.1")},
            "bn3": {"bn": _bn_s(sd, "bn3")},
        },
    }

    jm = SEConvBlock(planes=16)
    x = rng.standard_normal((1, 224, 300, 32)).astype(np.float32)
    with torch.no_grad():
        t_out, t_att = tm(_nchw(x))
    out, att = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), _nhwc(t_out), atol=5e-5)
    np.testing.assert_allclose(np.asarray(att), _nhwc(t_att), atol=5e-5)


def test_scale_atten_convblock_matches_reference(rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.scale_atten_convblock(in_size=16, out_size=4).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    variables = {
        "params": {
            "channel_gate": {
                "fc1": _dense(sd, "cbam.ChannelGate.mlp.1"),
                "fc2": _dense(sd, "cbam.ChannelGate.mlp.3"),
            },
            "spatial_gate": {
                "conv1_conv": _conv(sd, "cbam.SpatialGate.conv1.conv", bias=False),
                "conv1_bn": _bn_p(sd, "cbam.SpatialGate.conv1.bn"),
                "conv2_conv": _conv(sd, "cbam.SpatialGate.conv2.conv", bias=False),
            },
            "conv3": _conv(sd, "conv3", bias=False),
            "bn3": {"bn": _bn_p(sd, "bn3")},
        },
        "batch_stats": {
            "spatial_gate": {"conv1_bn": _bn_s(sd, "cbam.SpatialGate.conv1.bn")},
            "bn3": {"bn": _bn_s(sd, "bn3")},
        },
    }

    jm = ScaleAttenConvBlock(out_size=4, reduction_ratio=4)
    x = rng.standard_normal((2, 24, 28, 16)).astype(np.float32)
    with torch.no_grad():
        expect = _nhwc(tm(_nchw(x)))
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


def test_upcat_deconv_matches_reference(rng):
    """Mismatch-free sizes (12,14): the torch.rand branch never fires, so the
    deconv+concat semantics themselves are comparable."""
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.UpCat(16, 8, True).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    variables = {"params": {"up": _conv(sd, "up")}}

    jm = UpCat(out_feat=8, is_deconv=True)
    skip = rng.standard_normal((2, 12, 14, 8)).astype(np.float32)
    down = rng.standard_normal((2, 6, 7, 16)).astype(np.float32)
    with torch.no_grad():
        expect = _nhwc(tm(_nchw(skip), _nchw(down)))
    got = jm.apply(variables, jnp.asarray(skip), jnp.asarray(down), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


def test_unet_dsv3_matches_reference(rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = ref.UnetDsv3(16, 4, (24, 28)).eval()
    _randomize_all(tm)
    sd = tm.state_dict()

    variables = {"params": {"conv": _conv(sd, "dsv.0")}}

    jm = UnetDsv3(out_size=(24, 28), out_channels=4)
    x = rng.standard_normal((2, 12, 14, 16)).astype(np.float32)
    with torch.no_grad():
        expect = _nhwc(tm(_nchw(x)))
    got = jm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)
