"""GhostNet components + UNetRNNGhost (reference archs_backup.py:390-616).

GhostModule: a dense "primary" conv producing oup/ratio channels plus a cheap
depthwise conv generating the remaining "ghost" channels, concatenated and
sliced to oup. On TPU the depthwise conv lowers to a VPU elementwise stencil and
XLA fuses the concat/slice; channel counts stay MXU-friendly via _make_divisible.
"""

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv
from ..ops.pool import global_avg_pool
from .rdc import _UNetRNNBase


def _make_divisible(v, divisor, min_value=None):
    """Channel rounding from the TF mobilenet repo (reference archs_backup.py:390-403)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    """relu6(x+3)/6 (reference archs_backup.py:405-409)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class SqueezeExcite(nn.Module):
    """SE block with hard-sigmoid gate (reference archs_backup.py:411-428)."""

    se_ratio: float = 0.25
    divisor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_chs = x.shape[-1]
        reduced = _make_divisible(in_chs * self.se_ratio, self.divisor)
        x_se = global_avg_pool(x)
        x_se = TorchConv(reduced, 1, dtype=self.dtype, name="conv_reduce")(x_se)
        x_se = nn.relu(x_se)
        x_se = TorchConv(in_chs, 1, dtype=self.dtype, name="conv_expand")(x_se)
        return x * hard_sigmoid(x_se)


class GhostModule(nn.Module):
    """Primary conv + cheap depthwise, concat, slice to oup
    (reference archs_backup.py:430-454)."""

    oup: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_channels = math.ceil(self.oup / self.ratio)
        new_channels = init_channels * (self.ratio - 1)

        x1 = TorchConv(init_channels, self.kernel_size, stride=self.stride,
                       padding=self.kernel_size // 2, use_bias=False,
                       dtype=self.dtype, name="primary_conv")(x)
        x1 = BatchNorm(dtype=self.dtype, name="primary_bn")(x1, use_running_average=not train)
        if self.relu:
            x1 = nn.relu(x1)

        x2 = TorchConv(new_channels, self.dw_size, padding=self.dw_size // 2,
                       groups=init_channels, use_bias=False,
                       dtype=self.dtype, name="cheap_conv")(x1)
        x2 = BatchNorm(dtype=self.dtype, name="cheap_bn")(x2, use_running_average=not train)
        if self.relu:
            x2 = nn.relu(x2)

        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., :self.oup]


class GhostBottleneck(nn.Module):
    """Ghost bottleneck w/ optional SE (reference archs_backup.py:456-503).

    ghost1(expand, relu) -> [SE] -> ghost2(project, linear) + shortcut. When
    in_chs != out_chs the shortcut is DW-conv + BN + 1x1 conv + BN.
    """

    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        residual = x

        x = GhostModule(self.mid_chs, relu=True, dtype=self.dtype, name="ghost1")(x, train)
        if self.se_ratio and self.se_ratio > 0.0:
            x = SqueezeExcite(se_ratio=self.se_ratio, dtype=self.dtype, name="se")(x)
        x = GhostModule(self.out_chs, relu=False, dtype=self.dtype, name="ghost2")(x, train)

        if in_chs == self.out_chs and self.stride == 1:
            shortcut = residual
        else:
            k = self.dw_kernel_size
            s = TorchConv(in_chs, k, stride=self.stride, padding=(k - 1) // 2,
                          groups=in_chs, use_bias=False, dtype=self.dtype,
                          name="shortcut_dw")(residual)
            s = BatchNorm(dtype=self.dtype, name="shortcut_dw_bn")(s, use_running_average=not train)
            s = TorchConv(self.out_chs, 1, use_bias=False, dtype=self.dtype,
                          name="shortcut_pw")(s)
            s = BatchNorm(dtype=self.dtype, name="shortcut_pw_bn")(s, use_running_average=not train)
            shortcut = s
        return x + shortcut


class UNetRNNGhost(_UNetRNNBase):
    """UNetRNN with GhostBottleneck(in, in/2, n_classes) score blocks
    (reference archs_backup.py:505-616; default decoder 'vanilla',
    archs_backup.py:505-507)."""

    decoder: str = "vanilla"

    def score(self, feats, train):
        filters = [int(f / self.feature_scale) for f in self.base_filters]
        scores = []
        for i, f in enumerate(reversed(feats)):  # coarsest first
            level = len(feats) - i
            blk = GhostBottleneck(mid_chs=filters[level - 1] // 2,
                                  out_chs=self.num_classes, dtype=self.dtype,
                                  name=f"score_block{level}")
            scores.append(blk(f, train))
        return scores
