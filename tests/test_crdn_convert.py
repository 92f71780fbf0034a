"""CRDN-family torch->flax key shim (utils.torch_convert.convert_crdn_state_dict).

The reference's CRDN defs (reference finished/archs1.py:214-360) break the
named-attribute checkpoint convention: the 5th encoder is attribute `center`,
unetConv2 wraps convs in indexed nn.Sequentials (`conv1.conv1.0.weight`), and
score blocks are bare Sequentials (`score_block1.0.weight`).  The fixture
below reproduces that exact key layout so the shim (and parity.py --arch
UNetRNN, which rides it) is validated against real index-style state dicts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.utils.torch_convert import (
    convert_crdn_state_dict, export_crdn_state_dict,
)

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


def _unet_conv2(cin, cout):
    # reference archs1.py:342-355 (is_batchnorm=True): indexed Sequentials
    return tnn.ModuleDict({
        "conv1": tnn.Sequential(tnn.Conv2d(cin, cout, 3, 1, 1),
                                tnn.BatchNorm2d(cout), tnn.ReLU()),
        "conv2": tnn.Sequential(tnn.Conv2d(cout, cout, 3, 1, 1),
                                tnn.BatchNorm2d(cout), tnn.ReLU()),
    })


class _RDC(tnn.Module):
    """reference archs1.py:145-210 — all four gate convs exist regardless of
    the decoder in use."""

    def __init__(self, hidden, k=3):
        super().__init__()
        pad = 1
        self.gru_catconv = tnn.Conv2d(hidden * 2, hidden * 2, k, padding=pad)
        self.gru_conv = tnn.Conv2d(hidden * 2, hidden, k, padding=pad)
        self.lstm_catconv = tnn.Conv2d(hidden * 2, hidden * 4, k, padding=pad)
        self.vanilla_conv = tnn.Conv2d(hidden * 2, hidden, k, padding=pad)

    def forward(self, x_cur, h_pre):
        h_up = F.interpolate(h_pre, size=x_cur.shape[2:], mode="bilinear",
                             align_corners=True)
        return torch.relu(self.vanilla_conv(torch.cat([h_up, x_cur], 1)))


class TorchCRDNIndexStyle(tnn.Module):
    """archs1.py:214-340 UNetRNN (vanilla decoder), index-style keys.

    `base_filters`/`use_center` reproduce the depth ablations too: UNetRM3
    (archs_backup.py:621-715) and UNetRM7 (:717-871) use plain conv1..N with
    no `center` attribute — RM7's conv5 is a REAL encoder block, the case the
    export-side center rename must not touch."""

    def __init__(self, n_classes=1, cin=3, feature_scale=4,
                 base_filters=(64, 128, 256, 512, 1024), use_center=True):
        super().__init__()
        f = [int(x / feature_scale) for x in base_filters]
        self.n_levels = len(f)
        chans = [cin] + f
        for i in range(self.n_levels):
            name = ("center" if use_center and i == self.n_levels - 1
                    else f"conv{i + 1}")
            self.add_module(name, _unet_conv2(chans[i], chans[i + 1]))
        self._enc_names = [("center" if use_center and i == self.n_levels - 1
                            else f"conv{i + 1}") for i in range(self.n_levels)]
        for i, ch in enumerate(f):
            self.add_module(f"score_block{i + 1}", tnn.Sequential(
                tnn.Conv2d(ch, n_classes, 5, padding=2),
                tnn.BatchNorm2d(n_classes), tnn.ReLU()))
        self.RDC = _RDC(n_classes)

    @staticmethod
    def _enc(block, x):
        return block["conv2"](block["conv1"](x))

    def forward(self, x):
        feats = []
        for i, name in enumerate(self._enc_names):
            if i > 0:
                x = F.max_pool2d(x, 2)
            x = self._enc(getattr(self, name), x)
            feats.append(x)
        xs = [getattr(self, f"score_block{i + 1}")(f)
              for i, f in reversed(list(enumerate(feats)))]
        h = torch.zeros_like(xs[0])
        for s in xs:
            h = self.RDC(s, h)
        return h


class _TorchGhostModule(tnn.Module):
    """reference archs_backup.py:430-454 key layout."""

    def __init__(self, inp, oup, kernel_size=1, ratio=2, dw_size=3, relu=True):
        super().__init__()
        import math
        self.oup = oup
        init_ch = math.ceil(oup / ratio)
        new_ch = init_ch * (ratio - 1)
        act = tnn.ReLU if relu else tnn.Identity
        self.primary_conv = tnn.Sequential(
            tnn.Conv2d(inp, init_ch, kernel_size, 1, kernel_size // 2, bias=False),
            tnn.BatchNorm2d(init_ch), act())
        self.cheap_operation = tnn.Sequential(
            tnn.Conv2d(init_ch, new_ch, dw_size, 1, dw_size // 2,
                       groups=init_ch, bias=False),
            tnn.BatchNorm2d(new_ch), act())

    def forward(self, x):
        x1 = self.primary_conv(x)
        x2 = self.cheap_operation(x1)
        return torch.cat([x1, x2], 1)[:, :self.oup]


class _TorchGhostBottleneck(tnn.Module):
    """reference archs_backup.py:456-503 (se_ratio=0, stride 1, in != out)."""

    def __init__(self, in_chs, mid_chs, out_chs, dw_kernel_size=3):
        super().__init__()
        self.ghost1 = _TorchGhostModule(in_chs, mid_chs, relu=True)
        self.ghost2 = _TorchGhostModule(mid_chs, out_chs, relu=False)
        self.shortcut = tnn.Sequential(
            tnn.Conv2d(in_chs, in_chs, dw_kernel_size, 1,
                       (dw_kernel_size - 1) // 2, groups=in_chs, bias=False),
            tnn.BatchNorm2d(in_chs),
            tnn.Conv2d(in_chs, out_chs, 1, bias=False),
            tnn.BatchNorm2d(out_chs))

    def forward(self, x):
        return self.ghost2(self.ghost1(x)) + self.shortcut(x)


class TorchGhostIndexStyle(TorchCRDNIndexStyle):
    """UNetRNNGhost (reference archs_backup.py:505-616): the CRDN skeleton
    with each score block replaced by Sequential(GhostBottleneck(f, f//2, n))."""

    def __init__(self, n_classes=1):
        super().__init__(n_classes=n_classes)
        for i, ch in enumerate((16, 32, 64, 128, 256)):
            self.add_module(f"score_block{i + 1}", tnn.Sequential(
                _TorchGhostBottleneck(ch, ch // 2, n_classes)))


def _randomized_fixture(cls=TorchCRDNIndexStyle, **kwargs):
    torch.manual_seed(0)
    tm = cls(**kwargs).eval()
    nprng = np.random.default_rng(1)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(torch.tensor(
                    nprng.uniform(0.5, 1.5, m.weight.shape), dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    nprng.uniform(-0.2, 0.2, m.bias.shape), dtype=torch.float32))
                m.running_mean.copy_(torch.tensor(
                    nprng.uniform(-0.1, 0.1, m.running_mean.shape), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    nprng.uniform(0.8, 1.2, m.running_var.shape), dtype=torch.float32))
    return tm


def test_crdn_index_style_convert_full_forward(rng):
    tm = _randomized_fixture()
    variables = convert_crdn_state_dict(tm.state_dict())

    jm = models.UNetRNN(num_classes=1, decoder="vanilla")
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


def test_crdn_convert_cli_end_to_end(rng, tmp_path, monkeypatch):
    """convert.py --arch UNetRNN: index-style .pth -> capsule (dead RDC gates
    pruned), capsule forward == torch, --export loads back into torch with a
    bit-identical forward (the missing dead gates are never used)."""
    import convert as convert_cli
    from pytorch_nested_unet_tpu.training import checkpoint

    monkeypatch.chdir(tmp_path)
    tm = _randomized_fixture()
    torch.save(tm.state_dict(), "crdn.pth")

    convert_cli.main(["--pth", "crdn.pth", "--arch", "UNetRNN",
                      "--arch_kwargs", '{"decoder": "vanilla"}',
                      "--name", "imported_crdn",
                      "--input_w", "32", "--input_h", "32"])
    _, variables, cfg = checkpoint.load_capsule("models/imported_crdn")
    assert cfg["arch_kwargs"] == '{"decoder": "vanilla"}'
    jm = models.UNetRNN(num_classes=1, decoder="vanilla")
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)

    convert_cli.main(["--export", "--name", "imported_crdn", "--out", "back.pth"])
    tm2 = TorchCRDNIndexStyle().eval()
    missing, unexpected = tm2.load_state_dict(
        torch.load("back.pth", weights_only=True), strict=False)
    assert not unexpected
    dead = ("gru_catconv", "gru_conv", "lstm_catconv")
    assert all("num_batches_tracked" in k or any(d in k for d in dead)
               for k in missing), missing
    with torch.no_grad():
        back = tm2(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(back, expect, atol=0)


_RM_SPECS = {
    # arch -> (base_filters, input size divisible by 2**(levels-1))
    "UNetRM3": ((64, 288, 512), 16),
    "UNetRM7": ((32, 64, 128, 256, 512, 1024, 2048), 64),
}


@pytest.mark.parametrize("arch", ["UNetRM3", "UNetRM7"])
def test_rm_depth_ablation_convert_and_export(arch, rng):
    """UNetRM3/RM7 (reference archs_backup.py:621-871): plain conv1..N keys,
    no `center`. RM7 is the regression case — its conv5 is a real encoder
    block that a blanket conv5->center export rename would corrupt."""
    from pytorch_nested_unet_tpu.utils.torch_convert import converters_for_arch

    filters, hw = _RM_SPECS[arch]
    tm = _randomized_fixture(base_filters=filters, use_center=False)
    to_flax, to_torch = converters_for_arch(arch)
    variables = to_flax(tm.state_dict())

    jm = models.create_model(arch, 1, 3, False,
                             decoder="vanilla", kernel_size=3)
    x = rng.standard_normal((1, hw, hw, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)

    sd = to_torch(variables)
    torch_keys = {k for k in tm.state_dict() if "num_batches_tracked" not in k}
    assert set(sd) == torch_keys  # in particular: conv5.*, never center.*


def test_ghost_convert_full_forward_and_export(rng):
    """UNetRNNGhost: GhostBottleneck score blocks (indexed primary_conv/
    cheap_operation/shortcut Sequentials, reference archs_backup.py:430-616)
    convert to a full-forward match, and export round-trips the exact torch
    key set (dead RDC gates excluded)."""
    from pytorch_nested_unet_tpu.utils.torch_convert import converters_for_arch

    tm = _randomized_fixture(cls=TorchGhostIndexStyle)
    to_flax, to_torch = converters_for_arch("UNetRNNGhost")
    variables = to_flax(tm.state_dict())

    jm = models.create_model("UNetRNNGhost", 1, 3, False, decoder="vanilla")
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)

    sd = to_torch(variables)
    torch_keys = {k for k in tm.state_dict() if "num_batches_tracked" not in k}
    assert set(sd) == torch_keys

    tm2 = TorchGhostIndexStyle().eval()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)
    with torch.no_grad():
        back = tm2(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(back, expect, atol=0)


def test_crdn_export_round_trips_into_torch(rng):
    tm = _randomized_fixture()
    variables = convert_crdn_state_dict(tm.state_dict())

    sd = export_crdn_state_dict(variables)
    torch_keys = {k for k in tm.state_dict() if "num_batches_tracked" not in k}
    assert set(sd) == torch_keys

    tm2 = TorchCRDNIndexStyle().eval()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        a = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
        b = tm2(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(a, b, atol=0)
