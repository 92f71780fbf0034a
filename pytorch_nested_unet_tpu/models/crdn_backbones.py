"""CRDN backbone family: VGG16RNN, ResNet{18,34,50,101,152}RNN, ResNetUNet/FCN.

Reference: CRDN.py:250-407 (VGG16RNN), :418-587 (ResNetRNN + factories
:876-898), :589-673 (Bottleneck/BasicBlock), :674-772 (ResNetUNet + unetUp),
:781-872 (ResNetFCN), :901-908 (ResNet50UNet/ResNet50FCN factories).

Documented divergences (SURVEY.md §7 quirk policy — rebuild intended behavior):
  - The reference ResNetRNN's LSTM branch unpacks 6 values from RDC which
    returns 2 (CRDN.py:558-562) — a crash; our decode chain handles LSTM
    correctly.
  - The reference hardcodes Bottleneck-expansion score-block in-channels
    (256..2048, CRDN.py:449-478), crashing ResNet18/34RNN (BasicBlock
    channels are 64..512); we infer in-channels from the actual features.
  - The unused `self.fc` classifier head (CRDN.py:441) and VGG16RNN's unused
    `self.score` conv (CRDN.py:355) are omitted (dead parameters).

TPU notes: ResNet stages are the canonical MXU workload; the stem keeps
stride 1 (CRDN.py:430, unlike torchvision's stride-2) so score maps stay
full-res. NHWC; BN stats in f32.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops.layers import BatchNorm, TorchConv, TorchConvTranspose
from ..ops.pool import max_pool2x2, max_pool_3x3_s2_p1
from ..ops.resize import resize_bilinear, resize_nearest
from .blocks import ConvBNReLU, UnetConv2
from .rdc import RDC, rdc_decode


class BasicBlock(nn.Module):
    """ResNet basic block (reference CRDN.py:639-664). expansion=1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, 3, stride=self.stride, padding=1,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, 3, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(self.planes, 1, stride=self.stride, use_bias=False,
                                 dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """ResNet bottleneck block (reference CRDN.py:589-633). expansion=4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, 3, stride=self.stride, padding=1,
                        use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, 1, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(self.planes * 4, 1, stride=self.stride, use_bias=False,
                                 dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


_BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck}


class _ResNetEncoder(nn.Module):
    """Stride-1 7x7 stem + 4 residual stages (reference CRDN.py:430-437,
    _make_layer :516-530). Returns [down1(1x), down2(1/2), ..., down5(1/16)]
    with the stem output *before* the pool as down1 (CRDN.py:533-543)."""

    block: str
    layers: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = _BLOCKS[self.block]
        exp = blk.expansion

        x = TorchConv(64, 7, stride=1, padding=3, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        down1 = nn.relu(x)
        x = max_pool_3x3_s2_p1(down1)

        feats = [down1]
        inplanes = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                s = stride if i == 0 else 1
                ds = i == 0 and (s != 1 or inplanes != planes * exp)
                x = blk(planes, stride=s, downsample=ds, dtype=self.dtype,
                        name=f"layer{stage + 1}_{i}")(x, train)
                inplanes = planes * exp
            feats.append(x)
        return feats


class ResNetRNN(nn.Module):
    """ResNet encoder + per-level 3x3 score blocks + RDC chain
    (reference CRDN.py:418-584)."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; unused
    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    kernel_size: int = 3
    decoder: str = "LSTM"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = _ResNetEncoder(self.block, self.layers, dtype=self.dtype,
                               name="encoder")(x, train)
        scores = []
        for i, f in enumerate(reversed(feats)):  # coarsest (down5) first
            blk = ConvBNReLU(self.num_classes, kernel_size=3, padding=1,
                             dtype=self.dtype,
                             name=f"conv{len(feats) - i}_score_block")
            scores.append(blk(f, train))
        rdc = RDC(self.num_classes, self.kernel_size, use_bias=self.use_bias,
                  decoder=self.decoder, dtype=self.dtype, name="RDC")
        return rdc_decode(rdc, scores, self.decoder).astype(jnp.float32)


class VGG16RNN(nn.Module):
    """VGG-16(BN) encoder + 5x5 score blocks + RDC chain
    (reference CRDN.py:250-407)."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; unused
    kernel_size: int = 3
    decoder: str = "LSTM"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        feats = []
        for b, (ch, n) in enumerate(cfg):
            if b > 0:
                x = max_pool2x2(x)
            for i in range(n):
                x = ConvBNReLU(ch, kernel_size=3, padding=1, dtype=self.dtype,
                               name=f"conv_block{b + 1}_{i}")(x, train)
            feats.append(x)
        scores = []
        for i, f in enumerate(reversed(feats)):
            blk = ConvBNReLU(self.num_classes, kernel_size=5, padding=2,
                             dtype=self.dtype,
                             name=f"score_block{len(feats) - i}")
            scores.append(blk(f, train))
        rdc = RDC(self.num_classes, self.kernel_size, use_bias=self.use_bias,
                  decoder=self.decoder, dtype=self.dtype, name="RDC")
        return rdc_decode(rdc, scores, self.decoder).astype(jnp.float32)


class UnetUp(nn.Module):
    """Deconv/bilinear up + align-corners resize to the skip + concat + conv
    (reference CRDN.py:753-772; the ResNetUNet variant whose conv takes
    out_size*2 channels)."""

    out_size: int
    is_deconv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, skip, below, train: bool = False):
        if self.is_deconv:
            up = TorchConvTranspose(self.out_size, 2, stride=2, dtype=self.dtype,
                                    name="up")(below)
        else:
            up = resize_bilinear(below, (below.shape[-3] * 2, below.shape[-2] * 2),
                                 align_corners=True)
        up = resize_bilinear(up, skip.shape[-3:-1], align_corners=True)
        merged = jnp.concatenate([skip, up], axis=-1)
        return UnetConv2(self.out_size, is_batchnorm=False, dtype=self.dtype,
                         name="conv")(merged, train)


class ResNetUNet(nn.Module):
    """ResNet-50 encoder + UNet decoder (reference CRDN.py:674-750)."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; unused
    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    is_deconv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        exp = _BLOCKS[self.block].expansion
        filters = [64] + [p * exp for p in (64, 128, 256, 512)]
        down1, down2, down3, down4, down5 = _ResNetEncoder(
            self.block, self.layers, dtype=self.dtype, name="encoder")(x, train)
        up4 = UnetUp(filters[3], self.is_deconv, dtype=self.dtype,
                     name="up_concat4")(down4, down5, train)
        up3 = UnetUp(filters[2], self.is_deconv, dtype=self.dtype,
                     name="up_concat3")(down3, up4, train)
        up2 = UnetUp(filters[1], self.is_deconv, dtype=self.dtype,
                     name="up_concat2")(down2, up3, train)
        up1 = UnetUp(filters[0], self.is_deconv, dtype=self.dtype,
                     name="up_concat1")(down1, up2, train)
        out = TorchConv(self.num_classes, 1, dtype=self.dtype, name="final")(up1)
        return out.astype(jnp.float32)


class ResNetFCN(nn.Module):
    """ResNet-50 encoder + FCN-style score-map summation decoder
    (reference CRDN.py:781-872). Pyramid upsampling uses torch's default
    nearest interpolation (F.interpolate, CRDN.py:855-863)."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; unused
    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stem_hw = (x.shape[-3], x.shape[-2])
        # ResNetFCN pools the stem output *before* layer1 (CRDN.py:836-839),
        # so its pyramid is 1/2 .. 1/32.
        full, down2, down3, down4, down5 = _ResNetEncoder(
            self.block, self.layers, dtype=self.dtype, name="encoder")(x, train)
        down1 = max_pool_3x3_s2_p1(full)
        # (down2..down5 already consumed the pooled stem inside the encoder)

        score = TorchConv(4096, 3, dtype=self.dtype, name="classifier_conv1")(down5)
        score = BatchNorm(dtype=self.dtype, name="classifier_bn1")(
            score, use_running_average=not train)
        score = nn.relu(score)
        # channel dropout (broadcast over H, W) = nn.Dropout2d (CRDN.py:808)
        score = nn.Dropout(0.5, broadcast_dims=(1, 2), deterministic=not train,
                           name="classifier_drop1")(score)
        score = TorchConv(4096, 1, dtype=self.dtype, name="classifier_conv2")(score)
        score = BatchNorm(dtype=self.dtype, name="classifier_bn2")(
            score, use_running_average=not train)
        score = nn.relu(score)
        score = nn.Dropout(0.5, broadcast_dims=(1, 2), deterministic=not train,
                           name="classifier_drop2")(score)
        score = TorchConv(self.num_classes, 1, dtype=self.dtype, name="classifier_conv3")(score)

        for feat, ch_name in ((down4, "score_pool4"), (down3, "score_pool3"),
                              (down2, "score_pool2"), (down1, "score_pool1")):
            pool_score = TorchConv(self.num_classes, 1, dtype=self.dtype,
                                   name=ch_name)(feat)
            score = resize_nearest(score, feat.shape[-3:-1]) + pool_score
        out = resize_nearest(score, stem_hw)
        return out.astype(jnp.float32)


def _factory(cls, name, **preset):
    def build(num_classes: int = 1, input_channels: int = 3,
              deep_supervision: bool = False, **kwargs):
        return cls(num_classes=num_classes, input_channels=input_channels,
                   deep_supervision=deep_supervision, **{**preset, **kwargs})
    build.__name__ = name
    build.__qualname__ = name
    build.__doc__ = f"{name} factory (reference CRDN.py:876-908)."
    return build


ResNet18RNN = _factory(ResNetRNN, "ResNet18RNN", block="basic", layers=(2, 2, 2, 2))
ResNet34RNN = _factory(ResNetRNN, "ResNet34RNN", block="basic", layers=(3, 4, 6, 3))
ResNet50RNN = _factory(ResNetRNN, "ResNet50RNN", block="bottleneck", layers=(3, 4, 6, 3))
ResNet101RNN = _factory(ResNetRNN, "ResNet101RNN", block="bottleneck", layers=(3, 4, 23, 3))
ResNet152RNN = _factory(ResNetRNN, "ResNet152RNN", block="bottleneck", layers=(3, 8, 36, 3))
ResNet50UNet = _factory(ResNetUNet, "ResNet50UNet", block="bottleneck", layers=(3, 4, 6, 3))
ResNet50FCN = _factory(ResNetFCN, "ResNet50FCN", block="bottleneck", layers=(3, 4, 6, 3))
