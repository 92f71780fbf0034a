"""torch -> flax weight migration for the flagship models.

The torch fixture below implements the standard published UNet++/UNet block
naming (VGGBlock attrs conv1/bn1/conv2/bn2; grid nodes convI_J; heads final*),
which is also the reference checkpoint format saved by trains.py:344-349.
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
    convert_reference_state_dict, export_reference_state_dict,
)


class TorchVGGBlock(tnn.Module):
    def __init__(self, cin, cmid, cout):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cmid, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(cmid)
        self.conv2 = tnn.Conv2d(cmid, cout, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(x)))


class TorchUNet(tnn.Module):
    """Standard 5-level UNet with bilinear align-corners upsampling (the
    published architecture the reference implements)."""

    def __init__(self, num_classes=1, input_channels=3,
                 nb=(32, 64, 128, 256, 512)):
        super().__init__()
        self.conv0_0 = TorchVGGBlock(input_channels, nb[0], nb[0])
        self.conv1_0 = TorchVGGBlock(nb[0], nb[1], nb[1])
        self.conv2_0 = TorchVGGBlock(nb[1], nb[2], nb[2])
        self.conv3_0 = TorchVGGBlock(nb[2], nb[3], nb[3])
        self.conv4_0 = TorchVGGBlock(nb[3], nb[4], nb[4])
        self.conv3_1 = TorchVGGBlock(nb[3] + nb[4], nb[3], nb[3])
        self.conv2_2 = TorchVGGBlock(nb[2] + nb[3], nb[2], nb[2])
        self.conv1_3 = TorchVGGBlock(nb[1] + nb[2], nb[1], nb[1])
        self.conv0_4 = TorchVGGBlock(nb[0] + nb[1], nb[0], nb[0])
        self.final = tnn.Conv2d(nb[0], num_classes, 1)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                     align_corners=True)
        pool = lambda t: F.max_pool2d(t, 2)
        x0 = self.conv0_0(x)
        x1 = self.conv1_0(pool(x0))
        x2 = self.conv2_0(pool(x1))
        x3 = self.conv3_0(pool(x2))
        x4 = self.conv4_0(pool(x3))
        x3_1 = self.conv3_1(torch.cat([x3, up(x4)], 1))
        x2_2 = self.conv2_2(torch.cat([x2, up(x3_1)], 1))
        x1_3 = self.conv1_3(torch.cat([x1, up(x2_2)], 1))
        x0_4 = self.conv0_4(torch.cat([x0, up(x1_3)], 1))
        return self.final(x0_4)


def test_unet_torch_weights_transplant(rng):
    torch.manual_seed(0)
    tm = TorchUNet().eval()
    with torch.no_grad():  # randomize BN so eval mode is a real test
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_reference_state_dict(tm.state_dict())
    jm = models.UNet(num_classes=1)

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


def test_round_trip():
    m = models.NestedUNet(num_classes=1, deep_supervision=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    sd = export_reference_state_dict(v)
    # DataParallel-prefixed like the reference saves through nn.DataParallel
    sd = {"module." + k: val for k, val in sd.items()}
    v2 = convert_reference_state_dict(sd)
    import jax.tree_util as jtu

    d1 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v["params"])}
    d2 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v2["params"])}
    assert set(d1) == set(d2)
    assert all(np.array_equal(d1[k], d2[k]) for k in d1)
    s1 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v["batch_stats"])}
    s2 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v2["batch_stats"])}
    assert set(s1) == set(s2) and all(np.array_equal(s1[k], s2[k]) for k in s1)


class TorchNestedUNet(tnn.Module):
    """Standard published UNet++ with deep supervision (the reference
    checkpoint format, archs_backup.py:84-152 semantics)."""

    def __init__(self, num_classes=1, input_channels=3,
                 nb=(32, 64, 128, 256, 512)):
        super().__init__()
        mk = TorchVGGBlock
        self.conv0_0 = mk(input_channels, nb[0], nb[0])
        self.conv1_0 = mk(nb[0], nb[1], nb[1])
        self.conv2_0 = mk(nb[1], nb[2], nb[2])
        self.conv3_0 = mk(nb[2], nb[3], nb[3])
        self.conv4_0 = mk(nb[3], nb[4], nb[4])
        self.conv0_1 = mk(nb[0] + nb[1], nb[0], nb[0])
        self.conv1_1 = mk(nb[1] + nb[2], nb[1], nb[1])
        self.conv2_1 = mk(nb[2] + nb[3], nb[2], nb[2])
        self.conv3_1 = mk(nb[3] + nb[4], nb[3], nb[3])
        self.conv0_2 = mk(nb[0] * 2 + nb[1], nb[0], nb[0])
        self.conv1_2 = mk(nb[1] * 2 + nb[2], nb[1], nb[1])
        self.conv2_2 = mk(nb[2] * 2 + nb[3], nb[2], nb[2])
        self.conv0_3 = mk(nb[0] * 3 + nb[1], nb[0], nb[0])
        self.conv1_3 = mk(nb[1] * 3 + nb[2], nb[1], nb[1])
        self.conv0_4 = mk(nb[0] * 4 + nb[1], nb[0], nb[0])
        self.final1 = tnn.Conv2d(nb[0], num_classes, 1)
        self.final2 = tnn.Conv2d(nb[0], num_classes, 1)
        self.final3 = tnn.Conv2d(nb[0], num_classes, 1)
        self.final4 = tnn.Conv2d(nb[0], num_classes, 1)

    def forward(self, x):
        up = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                     align_corners=True)
        pool = lambda t: F.max_pool2d(t, 2)
        cat = lambda *ts: torch.cat(ts, 1)
        x0_0 = self.conv0_0(x)
        x1_0 = self.conv1_0(pool(x0_0))
        x0_1 = self.conv0_1(cat(x0_0, up(x1_0)))
        x2_0 = self.conv2_0(pool(x1_0))
        x1_1 = self.conv1_1(cat(x1_0, up(x2_0)))
        x0_2 = self.conv0_2(cat(x0_0, x0_1, up(x1_1)))
        x3_0 = self.conv3_0(pool(x2_0))
        x2_1 = self.conv2_1(cat(x2_0, up(x3_0)))
        x1_2 = self.conv1_2(cat(x1_0, x1_1, up(x2_1)))
        x0_3 = self.conv0_3(cat(x0_0, x0_1, x0_2, up(x1_2)))
        x4_0 = self.conv4_0(pool(x3_0))
        x3_1 = self.conv3_1(cat(x3_0, up(x4_0)))
        x2_2 = self.conv2_2(cat(x2_0, x2_1, up(x3_1)))
        x1_3 = self.conv1_3(cat(x1_0, x1_1, x1_2, up(x2_2)))
        x0_4 = self.conv0_4(cat(x0_0, x0_1, x0_2, x0_3, up(x1_3)))
        return [self.final1(x0_1), self.final2(x0_2),
                self.final3(x0_3), self.final4(x0_4)]


def test_nested_unet_torch_weights_transplant(rng):
    torch.manual_seed(1)
    tm = TorchNestedUNet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_reference_state_dict(tm.state_dict())
    jm = models.NestedUNet(num_classes=1, deep_supervision=True)

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = [o.numpy().transpose(0, 2, 3, 1)
                  for o in tm(torch.tensor(x.transpose(0, 3, 1, 2)))]
    got = jm.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == 4
    for g, e in zip(got, expect):
        np.testing.assert_allclose(np.asarray(g), e, atol=5e-5)
