"""DoubleUnet — iterative bottom-up/top-down net with dense lateral connections.

Reference: archs.py:1080-1239 (vendored from csPose models/CS_V2.py, per the
comment at archs.py:1081). The reference copy is dead code: it requires fastai
(`fv.create_body`, archs.py:21,1186) and crashes on `torch.ones()` with no
arguments (archs.py:1190). This module rebuilds the *intended* architecture
(SURVEY.md §7 quirk policy): a ResNet bottom-up (BU) body and a mirrored
top-down (TD) decoder of UnetBlocks, run for `iterations` rounds, where each
round's BU groups consume the previous round's mirrored TD outputs and each
TD group consumes this round's mirrored BU output — the reference wires this
with torch forward hooks (`Lateral`/`DenseLateral`, archs.py:1146-1177); in
JAX the laterals are explicit functional state threaded through the loop,
which is both simpler and jit-friendly (no mutable hook state).

Wiring parity with the reference:
  - `UnetBlock` = conv3x3(ni->ni)+BN+ReLU -> [bilinear x2, align_corners=False]
    -> conv3x3(ni->nf)+BN+ReLU (archs.py:1089-1104).
  - TD blocks are built from the reversed per-block output shapes of the BU
    body and grouped to mirror the BU layer groups (`_group_td`,
    archs.py:1110-1121); only the first block of each TD group receives the
    BU lateral, i.e. doubled in-channels at the group starts
    (`_bu_laterals_idx`, archs.py:1083-1087, used at archs.py:1205-1210).
  - The first residual block of every BU group gets a doubled input conv (and
    a downsample projection when channels change) to accept the TD lateral
    (`double_res_block`, archs.py:1124-1141).
  - First iteration TD laterals are zeros (`DenseLateral.forward`,
    archs.py:1171-1176).
  - `middle_conv` = conv_layer(ni, 2ni) + conv_layer(2ni, ni) at the bottom
    (archs.py:1198-1201); `td_head` = conv_layer(c, c) + 1x1 conv to td_c
    (archs.py:1213-1217).

Documented divergences (intended-behavior fixes):
  - `self.weights = torch.ones()` (archs.py:1190) crashes; csPose uses a
    learnable per-iteration weight vector when `weighted_sum=True`. We
    implement that: outputs are combined as a softmax-weighted sum.
  - td_c defaults to `num_classes` and head outputs are upsampled to input
    resolution so the model satisfies the trainer contract
    (num_classes, input_channels, deep_supervision); the reference returns
    16-channel maps at 1/4 resolution that no trainer here could consume.
  - deep_supervision=True returns the per-iteration output list (the
    reference always returns the list); False returns the final iteration.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv
from ..ops.pool import max_pool_3x3_s2_p1
from ..ops.resize import resize_bilinear


class UnetBlock(nn.Module):
    """TD decoder block (reference archs.py:1089-1104)."""

    out_channels: int
    upsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ni = x.shape[-1]
        x = TorchConv(ni, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        if self.upsample:
            h, w = x.shape[1], x.shape[2]
            x = resize_bilinear(x, (h * 2, w * 2), align_corners=False)
        x = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="bn2")(x, use_running_average=not train)
        return nn.relu(x)


class _DoubledBasicBlock(nn.Module):
    """ResNet basic block whose input conv accepts the concatenated TD lateral
    (`double_res_block`, reference archs.py:1124-1141). The residual path is
    the *un-doubled* input; a 1x1 projection reconciles channels, mirroring
    the downsample branch the reference splices in."""

    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, lateral, train: bool = False):
        inp = jnp.concatenate([x, lateral], axis=-1)
        out = TorchConv(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv1")(inp)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, 3, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        residual = TorchConv(self.planes, 1, stride=self.stride, use_bias=False,
                             dtype=self.dtype, name="downsample_conv")(inp)
        residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(
            residual, use_running_average=not train)
        return nn.relu(out + residual)


class _PlainBasicBlock(nn.Module):
    """Standard ResNet basic block for the non-first blocks of a BU group."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

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


class _ConvLayer(nn.Module):
    """conv3x3(bias=False)+BN+ReLU (`conv_layer`, reference archs.py:1143-1148)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.out_channels, 3, padding=1, use_bias=False,
                      dtype=self.dtype, name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class DoubleUnet(nn.Module):
    """Iterative BU/TD net (reference archs.py:1181-1239, intended behavior).

    BU body: ResNet-18-shaped — stem (7x7/2 + BN + ReLU + maxpool3x3/2) then
    4 groups of `layers[g]` basic blocks at widths (64,128,256,512); the first
    block of group g is a `_DoubledBasicBlock` consuming the previous
    iteration's mirrored TD output (zeros on iteration 0). TD: one UnetBlock
    per BU block, reversed, grouped to mirror BU; the first block of each TD
    group consumes this iteration's mirrored BU output. The BU/TD stride-2
    boundaries are where TD upsamples.
    """

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False
    iterations: int = 2
    layers: Sequence[int] = (2, 2, 2, 2)
    weighted_sum: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = (64, 128, 256, 512)
        n_groups = len(widths)

        # Instantiate every weight-bearing submodule ONCE so the iteration
        # loop shares parameters (the reference reuses the same bu/td modules
        # each round, archs.py:1226-1231).
        fe_conv = TorchConv(64, 7, stride=2, padding=3, use_bias=False,
                            dtype=self.dtype, name="fe_conv1")
        fe_bn = BatchNorm(dtype=self.dtype, name="fe_bn1")
        bu_first = [_DoubledBasicBlock(widths[g], stride=1 if g == 0 else 2,
                                       dtype=self.dtype, name=f"bu{g}_block0")
                    for g in range(n_groups)]
        bu_rest = [[_PlainBasicBlock(widths[g], dtype=self.dtype,
                                     name=f"bu{g}_block{b}")
                    for b in range(1, self.layers[g])] for g in range(n_groups)]
        middle = [_ConvLayer(widths[-1] * 2, dtype=self.dtype, name="middle0"),
                  _ConvLayer(widths[-1], dtype=self.dtype, name="middle1")]
        td_groups = []
        for g in range(n_groups):
            blocks = [UnetBlock(widths[g], dtype=self.dtype, name=f"td{g}_block{b}")
                      for b in range(self.layers[g] - 1)]
            blocks.append(UnetBlock(widths[g - 1] if g > 0 else 64, upsample=g > 0,
                                    dtype=self.dtype,
                                    name=f"td{g}_block{self.layers[g] - 1}"))
            td_groups.append(blocks)
        head0 = _ConvLayer(64, dtype=self.dtype, name="td_head0")
        head1 = TorchConv(self.num_classes, 1, use_bias=False, dtype=self.dtype,
                          name="td_head1")

        img_features = max_pool_3x3_s2_p1(nn.relu(
            fe_bn(fe_conv(x), use_running_average=not train)))
        # 64 @ 1/4 (reference fe = bu[:4], archs.py:1185)

        # TD laterals from the previous iteration, keyed by BU group (zeros on
        # iteration 0 — DenseLateral.forward, reference archs.py:1171-1176).
        # Shapes mirror exactly: TD group paired with BU group g outputs the
        # same (C, H, W) as BU group g's input.
        td_lats = [None] * n_groups
        outs = []
        for _ in range(self.iterations):
            # --- bottom-up pass (reference archs.py:1228: x = self.bu(...)) ---
            h = img_features
            bu_outs = []
            for g in range(n_groups):
                lat = td_lats[g] if td_lats[g] is not None else jnp.zeros_like(h)
                h = bu_first[g](h, lat, train=train)
                for blk in bu_rest[g]:
                    h = blk(h, train=train)
                bu_outs.append(h)

            # --- middle (reference archs.py:1198-1201, :1229) ---
            h = middle[0](h, train=train)
            h = middle[1](h, train=train)

            # --- top-down pass, mirrored groups (reference archs.py:1203-1217,
            # lateral pairing zip(bu, td[::-1]) archs.py:1221-1224); the group
            # start takes the dense BU lateral (doubled c_in, archs.py:1205-1210)
            # and the group's last block crosses the resolution/width boundary ---
            new_td = [None] * n_groups
            for g in reversed(range(n_groups)):
                h = jnp.concatenate([h, bu_outs[g]], axis=-1)
                for blk in td_groups[g]:
                    h = blk(h, train=train)
                new_td[g] = h
            td_lats = new_td

            # --- head (reference archs.py:1213-1217, :1231) ---
            y = head1(head0(h, train=train))
            # divergence: upsample 1/4 -> full res so the trainer can consume it
            y = resize_bilinear(y, (x.shape[1], x.shape[2]), align_corners=False)
            outs.append(y)

        if self.weighted_sum:
            w = self.param("iteration_weights", nn.initializers.ones,
                           (self.iterations,), jnp.float32)
            w = nn.softmax(w)
            combined = sum(w[i] * outs[i] for i in range(self.iterations))
            return outs + [combined] if self.deep_supervision else combined
        if self.deep_supervision:
            return outs
        return outs[-1]
