"""Shared conv blocks of the model zoo (NHWC, bf16-friendly)."""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops.decoder_fusion import fused_upcat_conv3x3
from ..ops.fused_bn import FusedBatchNormReLU
from ..ops.init import torch_bias_init, torch_conv_kernel_init
from ..ops.layers import BatchNorm, TorchConv


class _MultipartConvInner(nn.Module):
    """Param scope mirroring TorchConv's inner `nn.Conv` (name 'conv')."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, parts):
        cin = sum(int(p.shape[-1]) for p in parts)
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(9 * cin),
                          (self.features,), jnp.float32)
        if self.dtype is not None:
            parts = [p.astype(self.dtype) for p in parts]
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return fused_upcat_conv3x3(tuple(parts), kernel, bias)


class MultipartConv3x3(nn.Module):
    """conv3x3(concat(parts), padding=1) with a TorchConv-identical param tree.

    Param path `<name>/conv/{kernel,bias}` and init math match TorchConv
    exactly (same scope-derived RNG fold), so a VGGBlock built on this for its
    first conv is checkpoint-compatible either way.  When
    `ops.decoder_fusion.enable_decoder_fusion(True)` is set and the shape is
    eligible, the concat+conv runs as the Pallas tap-matmul kernel and the
    concatenated activation is never materialized; otherwise it is the exact
    XLA concat+conv the zoo always used (reference archs_backup.py:123-141).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, parts):
        return _MultipartConvInner(self.features, self.dtype, name="conv")(parts)


class VGGBlock(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 — the universal encoder/decoder block.

    Reference: archs_backup.py:24-42 (identical finished/archs1.py:14-33).
    BN+ReLU run through FusedBatchNormReLU (Pallas single-pass statistics and
    fused backward on TPU when ops.fused_bn is enabled; identical math on the
    plain path).

    The input may be a tuple/list of NHWC parts (a decoder node's skips + the
    upsampled feed): the first conv then runs through MultipartConv3x3 — same
    params, same math, but fusable into the Pallas decoder kernel so the
    channel concat never hits HBM (SURVEY §7 step 10).

    Conv outputs are tagged with `checkpoint_name` (identity outside a remat
    region) so NestedUNet's `remat="policy"` mode can save exactly the conv
    outputs and recompute the cheap BN/ReLU elementwise math in backward —
    trading near-free VPU FLOPs for HBM residual traffic on a
    bandwidth-bound step. See models/nested_unet.py.
    """

    middle_channels: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (tuple, list)):
            x = MultipartConv3x3(self.middle_channels, dtype=self.dtype, name="conv1")(x)
        else:
            x = TorchConv(self.middle_channels, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        x = checkpoint_name(x, "vgg_conv1")
        x = FusedBatchNormReLU(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = checkpoint_name(x, "vgg_conv2")
        x = FusedBatchNormReLU(dtype=self.dtype, name="bn2")(x, use_running_average=not train)
        return x


class UnetConv2(nn.Module):
    """(conv3x3 [-> BN] -> ReLU) x2 with optional BN.

    Reference: archs_backup.py:365-383, CRDN.py:201-221.
    """

    out_channels: int
    is_batchnorm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            if self.is_batchnorm:
                x = FusedBatchNormReLU(dtype=self.dtype, name=f"bn{i}")(
                    x, use_running_average=not train)
            else:
                x = nn.relu(x)
        return x


class ConvBNReLU(nn.Module):
    """Single conv -> BN -> ReLU unit (score blocks etc.).

    conv_impl: measured NEGATIVE result (v5e, UNetRNN protocol) — the CRDN
    score blocks' 5x5 C->n_classes convs run at ~4%% MXU utilization (326 us
    forward at the 96x96 level, 25x over streaming), but lowering them as
    shift-sums makes the FULL step *worse*: XLA materializes the k*k shifted
    slabs in the backward pass, HBM traffic 2.4 -> 6.6 GB/step and step time
    4.1 -> 7.2 ms. So 'auto' keeps the MXU path here; 'shift' remains
    available for inference-only/forward-heavy uses where it does win.
    (The RDC cell's 3x3 convs over 2*n_classes channels are small enough that
    shift is neutral-to-better — see models/rdc.py.)
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    conv_impl: str = "auto"  # auto(=mxu here)|mxu|shift
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.small_conv import ShiftConv

        shift = self.stride == 1 and self.conv_impl == "shift"
        if shift:
            x = ShiftConv(self.out_channels, self.kernel_size,
                          padding=self.padding, dtype=self.dtype, name="conv")(x)
        else:
            x = TorchConv(self.out_channels, self.kernel_size, stride=self.stride,
                          padding=self.padding, dtype=self.dtype, name="conv")(x)
        return FusedBatchNormReLU(dtype=self.dtype, name="bn")(
            x, use_running_average=not train)
