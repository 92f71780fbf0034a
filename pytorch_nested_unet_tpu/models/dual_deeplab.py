"""DualResNet / DeepLabV3+ RGB-D family with SAGate cross-modal fusion.

Reference: archs.py:1483-1864 — a dual-path ResNet-101 + DeepLabV3+ head
pasted from the SA-Gate RGB-D segmentation project. The reference copy is
dead code: it references undefined names `SAGate` (archs.py:1546-1549),
`DualBottleneck` (archs.py:1678), `config`, `logger`, `time`
(archs.py:1704-1713), so nothing in it can run. This module rebuilds the
*intended* architecture (SURVEY.md §7 quirk policy), TPU-native:

  - `SAGate` / `FSP` — the Separation-and-Aggregation gate the reference
    imports from its upstream project: per-modality Feature Separation Parts
    (SE-style channel recalibration of the main path by the guide path)
    followed by a softmax spatial gate that blends the two recalibrated
    streams into a merged feature, feeding both paths `(x + merge)/2`.
  - `DualBottleneck` — a ResNet bottleneck applied to the [rgb, hha] pair
    with separate weights per path (the reference's `load_dualpath_model`,
    archs.py:1615-1675, duplicates every conv/bn into `hha_*` keys — that is
    the weight layout this block implies).
  - `DualResNet` (archs.py:1483-1608): dual 7x7 (or deep 3-conv) stems,
    4 dual stages, SAGate after each stage; returns per-stage gated pairs
    and merged features.
  - `ASPP` (archs.py:1760-1824): 1x1 + three dilated 3x3 branches + global
    pooling branch, LeakyReLU, residual pool add.
  - `Head` (archs.py:1826-1864): ASPP on the stride-16 merge, low-level
    reduction to 48ch, upsample+concat, two 3x3 convs, classifier; auxiliary
    `FCNHead` (archs.py:1702-1714) on the raw encoder output.
  - `DeepLab` (archs.py:1716-1758): backbone + head, with layer4 converted
    to stride-1 dilated convs (`_nostride_dilate`, archs.py:1744-1757) so the
    output stride stays 16; predictions upsampled to input size
    (align_corners=True).

Documented divergences:
  - `config.bn_eps` / `config.bn_momentum` (archs.py:1721-1723) are
    parameterized (`bn_eps`, defaults matching the reference's norm defaults).
  - The reference's criterion-inside-the-model (archs.py:1738-1746) is not
    rebuilt — losses live in `losses.py` like the rest of this framework;
    `DeepLab.__call__` returns `[aux, pred]` in training (last element = main
    head, so the trainer averages both losses and reads metrics off `pred`,
    matching loss + loss_aux at archs.py:1742-1746) and `pred` in eval,
    mirroring the label=None dispatch.
  - `hha=None` feeds the RGB input to both paths so the model satisfies the
    single-input trainer contract; pass a real HHA tensor for RGB-D.
  - `load_dualpath_model`'s rgb→hha weight duplication (archs.py:1615-1675)
    is `duplicate_dualpath_params` below, operating on JAX pytrees.

TPU notes: the dual paths are batched through shared-shape convs the MXU
loves; ASPP's dilated convs keep static shapes; the global-pool branch
broadcasts instead of `repeat` (same math, no materialized tiling).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv
from ..ops.pool import max_pool_3x3_s2_p1
from ..ops.resize import resize_bilinear


class FSP(nn.Module):
    """Feature Separation Part: SE-style channel weights computed from the
    concatenated pair recalibrate the guide path into the main path
    (`out = main + w * guide`). The SAGate building block the reference
    imports (used at archs.py:1546-1549)."""

    out_channels: int
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, guide, main):
        combined = jnp.concatenate([guide, main], axis=-1)
        pooled = jnp.mean(combined, axis=(1, 2))  # global average pool
        c2 = combined.shape[-1]
        w = nn.Dense(max(1, c2 // self.reduction), dtype=self.dtype, name="fc1")(pooled)
        w = nn.relu(w)
        w = nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(w)
        w = nn.sigmoid(w)[:, None, None, :]
        return main + w * guide


class SAGate(nn.Module):
    """Separation-and-Aggregation gate over an [rgb, hha] pair.

    Undefined in the reference (archs.py:1546-1549 instantiates it with
    in_planes=out_planes=stage width); rebuilt from its upstream definition:
    two FSPs (each path recalibrated by the other), then a 2-way softmax
    spatial gate blending the recalibrated streams into `merge`; both paths
    continue as `(x + merge) / 2`. Returns ([rgb', hha'], merge)."""

    out_channels: int
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, pair):
        rgb, hha = pair
        rec_rgb = FSP(self.out_channels, self.reduction, dtype=self.dtype,
                      name="fsp_rgb")(hha, rgb)
        rec_hha = FSP(self.out_channels, self.reduction, dtype=self.dtype,
                      name="fsp_hha")(rgb, hha)
        cat = jnp.concatenate([rec_rgb, rec_hha], axis=-1)
        gate_rgb = TorchConv(1, 1, dtype=self.dtype, name="gate_rgb")(cat)
        gate_hha = TorchConv(1, 1, dtype=self.dtype, name="gate_hha")(cat)
        att = nn.softmax(jnp.concatenate([gate_rgb, gate_hha], axis=-1), axis=-1)
        merge = rec_rgb * att[..., 0:1] + rec_hha * att[..., 1:2]
        return [nn.relu((rgb + merge) / 2.0), nn.relu((hha + merge) / 2.0)], merge


class DualBottleneck(nn.Module):
    """ResNet bottleneck over the [rgb, hha] pair, separate weights per path
    (conv*/bn* and hha_conv*/hha_bn* — the key layout `load_dualpath_model`
    produces, archs.py:1630-1660). expansion=4."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_eps: float = 1e-5
    dtype: Any = None
    expansion = 4

    @nn.compact
    def __call__(self, pair, train: bool = False):
        outs = []
        for prefix, x in zip(("", "hha_"), pair):
            residual = x
            out = TorchConv(self.planes, 1, use_bias=False, dtype=self.dtype,
                            name=f"{prefix}conv1")(x)
            out = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                            name=f"{prefix}bn1")(out, use_running_average=not train)
            out = nn.relu(out)
            out = TorchConv(self.planes, 3, stride=self.stride,
                            padding=self.dilation, dilation=self.dilation,
                            use_bias=False, dtype=self.dtype,
                            name=f"{prefix}conv2")(out)
            out = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                            name=f"{prefix}bn2")(out, use_running_average=not train)
            out = nn.relu(out)
            out = TorchConv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                            name=f"{prefix}conv3")(out)
            out = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                            name=f"{prefix}bn3")(out, use_running_average=not train)
            if self.downsample:
                residual = TorchConv(self.planes * 4, 1, stride=self.stride,
                                     use_bias=False, dtype=self.dtype,
                                     name=f"{prefix}downsample_conv")(x)
                residual = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                                     name=f"{prefix}downsample_bn")(
                    residual, use_running_average=not train)
            outs.append(nn.relu(out + residual))
        return outs


class _DualStem(nn.Module):
    """One path of the stem: 7x7/2 conv, or the 3-conv deep stem
    (reference archs.py:1489-1529)."""

    deep_stem: bool
    stem_width: int
    bn_eps: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deep_stem:
            for i, (c, s) in enumerate(((self.stem_width, 2), (self.stem_width, 1))):
                x = TorchConv(c, 3, stride=s, padding=1, use_bias=False,
                              dtype=self.dtype, name=f"conv1_{i}")(x)
                x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                              name=f"bn1_{i}")(x, use_running_average=not train)
                x = nn.relu(x)
            x = TorchConv(self.stem_width * 2, 3, stride=1, padding=1,
                          use_bias=False, dtype=self.dtype, name="conv1_2")(x)
        else:
            x = TorchConv(64, 7, stride=2, padding=3, use_bias=False,
                          dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train)
        return max_pool_3x3_s2_p1(nn.relu(x))


class DualResNet(nn.Module):
    """Dual-path ResNet with SAGate fusion after every stage
    (reference archs.py:1483-1608). `layer4_dilations` implements DeepLab's
    `_nostride_dilate` surgery (stride-1 dilated layer4, archs.py:1727-1731,
    :1744-1757) without post-hoc module mutation."""

    layers: Sequence[int] = (3, 4, 23, 3)
    deep_stem: bool = False
    stem_width: int = 32
    bn_eps: float = 1e-5
    layer4_dilated: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, rgb, hha, train: bool = False):
        x1 = _DualStem(self.deep_stem, self.stem_width, self.bn_eps,
                       dtype=self.dtype, name="stem")(rgb, train=train)
        x2 = _DualStem(self.deep_stem, self.stem_width, self.bn_eps,
                       dtype=self.dtype, name="hha_stem")(hha, train=train)
        pair = [x1, x2]

        inplanes = self.stem_width * 2 if self.deep_stem else 64
        blocks_out, merges = [], []
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.layer4_dilated:
                # DeepLab surgery: layer4 keeps stride 1; block i dilates by
                # 2 * 2**i (reference dilate doubling, archs.py:1727-1731)
                stride = 1
                dilation = 2
            for i in range(n):
                s = stride if i == 0 else 1
                d = dilation * (2 ** i) if (stage == 3 and self.layer4_dilated) else 1
                need_ds = (i == 0) and (s != 1 or inplanes != planes * 4)
                pair = DualBottleneck(planes, stride=s, dilation=max(d, 1),
                                      downsample=need_ds, bn_eps=self.bn_eps,
                                      dtype=self.dtype,
                                      name=f"layer{stage + 1}_{i}")(pair, train=train)
                inplanes = planes * 4
            pair, merge = SAGate(planes * 4, dtype=self.dtype,
                                 name=f"sagate{stage}")(pair)
            blocks_out.append(pair)
            merges.append(merge)
        return blocks_out, merges


class FCNHead(nn.Module):
    """Auxiliary FCN head (reference `_FCNHead`, archs.py:1702-1714)."""

    num_classes: int
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 4
        x = TorchConv(inter, 3, padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        x = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        if train:
            x = nn.Dropout(0.1, deterministic=False)(x)
        return TorchConv(self.num_classes, 1, dtype=self.dtype, name="conv2")(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference archs.py:1760-1824):
    [1x1, 3x3 d=r0, 3x3 d=r1, 3x3 d=r2] -> BN -> LeakyReLU -> 1x1 reduce,
    plus a global-pooling branch added residually, then BN + LeakyReLU."""

    out_channels: int
    dilation_rates: Tuple[int, int, int] = (12, 24, 36)
    hidden_channels: int = 256
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [TorchConv(self.hidden_channels, 1, use_bias=False,
                              dtype=self.dtype, name="map_conv0")(x)]
        for i, r in enumerate(self.dilation_rates):
            branches.append(TorchConv(self.hidden_channels, 3, padding=r,
                                      dilation=r, use_bias=False,
                                      dtype=self.dtype, name=f"map_conv{i + 1}")(x))
        out = jnp.concatenate(branches, axis=-1)
        out = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="map_bn")(
            out, use_running_average=not train)
        out = nn.leaky_relu(out, negative_slope=0.01)
        out = TorchConv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                        name="red_conv")(out)

        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = TorchConv(self.hidden_channels, 1, use_bias=False,
                         dtype=self.dtype, name="global_pooling_conv")(pool)
        pool = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                         name="global_pooling_bn")(
            pool, use_running_average=not train)
        pool = nn.leaky_relu(pool, negative_slope=0.01)
        pool = TorchConv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                         name="pool_red_conv")(pool)
        # reference repeats the pooled vector over HxW (archs.py:1812);
        # broadcasting is the same math with no materialized tile
        out = out + pool
        out = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="red_bn")(
            out, use_running_average=not train)
        return nn.leaky_relu(out, negative_slope=0.01)


class Head(nn.Module):
    """DeepLabV3+ decoder head (reference archs.py:1826-1864): ASPP on the
    last merge, reduce the first (stride-4) merge to 48ch, upsample+concat,
    two 3x3 convs, 1x1 classifier; plus the auxiliary FCN head on the raw
    encoder output."""

    num_classes: int
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, merges, train: bool = False):
        f = merges[-1]
        encoder_out = f
        f = ASPP(256, (6, 12, 18), bn_eps=self.bn_eps, dtype=self.dtype,
                 name="aspp")(f, train=train)

        low = merges[0]
        low = TorchConv(48, 1, use_bias=False, dtype=self.dtype,
                        name="reduce_conv")(low)
        low = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype, name="reduce_bn")(
            low, use_running_average=not train)
        low = nn.relu(low)

        f = resize_bilinear(f, (low.shape[1], low.shape[2]), align_corners=True)
        f = jnp.concatenate([f, low], axis=-1)
        for i in range(2):
            f = TorchConv(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                          name=f"last_conv{i}")(f)
            f = BatchNorm(epsilon=self.bn_eps, dtype=self.dtype,
                          name=f"last_bn{i}")(f, use_running_average=not train)
            f = nn.relu(f)
        if train:
            f = nn.Dropout(0.1, deterministic=False)(f)
        pred = TorchConv(self.num_classes, 1, dtype=self.dtype, name="classify")(f)
        aux = FCNHead(self.num_classes, bn_eps=self.bn_eps, dtype=self.dtype,
                      name="auxlayer")(encoder_out, train=train)
        return pred, aux


class DeepLab(nn.Module):
    """RGB-D DeepLabV3+ over the SAGate DualResNet-101 backbone
    (reference archs.py:1716-1758).

    `__call__(x, hha=None)`: hha defaults to the RGB input (single-input
    trainer contract); training returns [aux, pred] both at input resolution
    (align_corners=True upsampling, archs.py:1740-1741) — last element is the
    main prediction, so the trainer's multi-head loss averages (pred, aux)
    exactly like the reference's loss + loss_aux (archs.py:1742-1746) while
    metrics read the main head. Eval returns pred alone.
    """

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # trainer contract; aux head serves this role
    layers: Sequence[int] = (3, 4, 23, 3)
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hha=None, train: bool = False):
        if hha is None:
            hha = x
        h, w = x.shape[1], x.shape[2]
        _, merges = DualResNet(layers=self.layers, deep_stem=True, stem_width=64,
                               bn_eps=self.bn_eps, layer4_dilated=True,
                               dtype=self.dtype, name="backbone")(x, hha, train=train)
        pred, aux = Head(self.num_classes, bn_eps=self.bn_eps, dtype=self.dtype,
                         name="head")(merges, train=train)
        pred = resize_bilinear(pred, (h, w), align_corners=True)
        if train or self.deep_supervision:
            aux = resize_bilinear(aux, (h, w), align_corners=True)
            return [aux, pred]
        return pred


def resnet101(**kwargs) -> DualResNet:
    """Factory matching the reference's `resnet101` (archs.py:1691-1696)."""
    return DualResNet(layers=(3, 4, 23, 3), **kwargs)


def duplicate_dualpath_params(params):
    """rgb→hha weight duplication: for every leaf under a module whose name
    has an `hha_`-prefixed sibling, copy the rgb value — the JAX equivalent of
    the reference's `load_dualpath_model` state-dict surgery
    (archs.py:1615-1675). Operates on a DualResNet/DeepLab params pytree
    (nested dicts) and returns a new pytree."""

    def rewrite(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: rewrite(tree[k[4:]] if k.startswith("hha_") and k[4:] in tree
                           else v)
                for k, v in tree.items()}

    return rewrite(params)
