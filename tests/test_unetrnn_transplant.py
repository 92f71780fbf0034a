"""Full-model numeric transplant: UNetRNN (GRU) vs an independent torch fixture
of the published CRDN architecture (encoder column -> per-level 5x5 score
blocks -> coarse-to-fine shared-GRU decoding, reference archs_backup.py:234-361).
Pins the complete wiring: block order, score-block/feature pairing, the
coarse-first decode order, and align-corners carry upsampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pytorch_nested_unet_tpu import models


class TorchDoubleConv(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.b1 = tnn.BatchNorm2d(cout)
        self.c2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.b2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.relu(self.b1(self.c1(x)))
        return F.relu(self.b2(self.c2(x)))


class TorchScore(tnn.Module):
    def __init__(self, cin, ncls):
        super().__init__()
        self.c = tnn.Conv2d(cin, ncls, 5, padding=2)
        self.b = tnn.BatchNorm2d(ncls)

    def forward(self, x):
        return F.relu(self.b(self.c(x)))


class TorchUNetRNN(tnn.Module):
    """CRDN with UNet backbone, GRU decoding cell (published formulation)."""

    def __init__(self, ncls=1, cin=3, scale=4):
        super().__init__()
        f = [int(v / scale) for v in (64, 128, 256, 512, 1024)]
        chans = [cin] + f
        self.encs = tnn.ModuleList([TorchDoubleConv(chans[i], f[i]) for i in range(5)])
        self.scores = tnn.ModuleList([TorchScore(f[i], ncls) for i in range(5)])
        self.cat = tnn.Conv2d(ncls * 2, ncls * 2, 3, padding=1)
        self.gru = tnn.Conv2d(ncls * 2, ncls, 3, padding=1)
        self.ncls = ncls

    def gru_cell(self, x_cur, h_pre):
        h_up = F.interpolate(h_pre, size=x_cur.shape[2:], mode="bilinear",
                             align_corners=True)
        rz = self.cat(torch.cat([h_up, x_cur], 1))
        r, z = torch.sigmoid(rz[:, :self.ncls]), torch.sigmoid(rz[:, self.ncls:])
        h_hat = torch.tanh(self.gru(torch.cat([x_cur, r * h_up], 1)))
        return z * h_up + (1 - z) * h_hat

    def forward(self, x):
        feats = []
        for i, enc in enumerate(self.encs):
            if i:
                x = F.max_pool2d(x, 2)
            x = enc(x)
            feats.append(x)
        scores = [s(f) for s, f in zip(self.scores, feats)]
        h = torch.zeros_like(scores[-1])
        for sc in reversed(scores):  # coarsest (deepest feature) first
            h = self.gru_cell(sc, h)
        return h


def _copy_conv(tconv, params, *path):
    node = params
    for p in path:
        node = node[p]
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(np.asarray(node["kernel"]).transpose(3, 2, 0, 1)))
        if tconv.bias is not None and "bias" in node:
            tconv.bias.copy_(torch.tensor(np.asarray(node["bias"])))


def _rand_bn(tbn, rng):
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, tbn.weight.shape[0]).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.uniform(-0.2, 0.2, tbn.bias.shape[0]).astype(np.float32)))
        tbn.running_mean.copy_(torch.tensor(rng.uniform(-0.1, 0.1, tbn.running_mean.shape[0]).astype(np.float32)))
        tbn.running_var.copy_(torch.tensor(rng.uniform(0.8, 1.2, tbn.running_var.shape[0]).astype(np.float32)))


def _bn_to_flax(tbn):
    return ({"scale": jnp.asarray(tbn.weight.detach().numpy()),
             "bias": jnp.asarray(tbn.bias.detach().numpy())},
            {"mean": jnp.asarray(tbn.running_mean.detach().numpy()),
             "var": jnp.asarray(tbn.running_var.detach().numpy())})


def test_unetrnn_full_forward_matches_torch(rng):
    torch.manual_seed(0)
    tm = TorchUNetRNN().eval()
    nprng = np.random.default_rng(1)
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            _rand_bn(m, nprng)

    jm = models.UNetRNN(num_classes=1, decoder="GRU")
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def set_conv(path, tconv):
        node = params
        for p in path[:-1]:
            node = node[p]
        node[path[-1]]["kernel"] = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
        if tconv.bias is not None:
            node[path[-1]]["bias"] = tconv.bias.detach().numpy()

    def set_bn(path, tbn):
        p, s = _bn_to_flax(tbn)
        nodep, nodes = params, stats
        for q in path[:-1]:
            nodep = nodep[q]
            nodes = nodes[q]
        nodep[path[-1]].update({k: np.asarray(v) for k, v in p.items()})
        nodes[path[-1]].update({k: np.asarray(v) for k, v in s.items()})

    for i in range(5):
        enc = tm.encs[i]
        set_conv((f"conv{i + 1}", "conv1", "conv"), enc.c1)
        set_conv((f"conv{i + 1}", "conv2", "conv"), enc.c2)
        set_bn((f"conv{i + 1}", "bn1"), enc.b1)
        set_bn((f"conv{i + 1}", "bn2"), enc.b2)
        sc = tm.scores[i]
        set_conv((f"score_block{i + 1}", "conv", "conv"), sc.c)
        set_bn((f"score_block{i + 1}", "bn"), sc.b)
    set_conv(("RDC", "gru_catconv", "conv"), tm.cat)
    set_conv(("RDC", "gru_conv", "conv"), tm.gru)

    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                   train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)
