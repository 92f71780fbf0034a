"""Attention U-Net family: AttU_Net, R2U_Net, R2AttU_Net.

Reference: archs.py:1240-1480 (up_conv, Recurrent_block, RRCNN_block,
Attention_block additive gates, R2AttU_Net, AttU_Net), conv_block archs.py:29-46.
Upstream provenance (cited in the reference): LeeJunHyun/Image_Segmentation.
`R2U_Net` is listed in the reference's archs_backup.__all__ (archs_backup.py:22)
but its body is commented out (archs_backup.py:1856-1974); we rebuild the
intended model — R2AttU_Net without the attention gates (SURVEY.md §7 quirk
policy).

Constructor contract: the reference classes take (img_ch, output_ch), which is
positionally incompatible with the trainer's (num_classes, input_channels, ...)
call (reference trains.py:219-221) — a latent bug we fix by keeping the uniform
keyword contract of this registry.

TPU notes: `nn.Upsample(scale_factor=2)` in up_conv defaults to *nearest*
interpolation — kept (ops.resize.resize_nearest); encoder filters are
64..1024, giving MXU-sized matmuls at every level.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv
from ..ops.pool import max_pool2x2
from ..ops.resize import resize_nearest
from .blocks import VGGBlock


class ConvBlock(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2, optional dropout (reference archs.py:29-46).

    Dropout is CHANNEL dropout (broadcast over H, W), matching the reference's
    nn.Dropout2d(0.5) semantics; drop_rate=0 disables it entirely (used by the
    parity harness, where framework-private dropout RNG would make stepwise
    training equivalence undefined)."""

    out_channels: int
    drop_out: bool = False
    drop_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in (1, 2):
            x = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype,
                          name=f"conv{i}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x)
        if self.drop_out and self.drop_rate > 0 and train:
            x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                           deterministic=not train, name="dropout")(x)
        return x


class UpConv(nn.Module):
    """Nearest 2x upsample -> conv3x3 -> BN -> ReLU (reference archs.py:1244-1256)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = resize_nearest(x, (x.shape[-3] * 2, x.shape[-2] * 2))
        x = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class RecurrentBlock(nn.Module):
    """t-step recurrent conv: x1 = conv(x + x1) with shared weights
    (reference archs.py:1257-1275)."""

    out_channels: int
    t: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv")
        bn = BatchNorm(dtype=self.dtype, name="bn")

        def step(v):
            return nn.relu(bn(conv(v), use_running_average=not train))

        x1 = step(x)
        for _ in range(self.t):
            x1 = step(x + x1)
        return x1


class RRCNNBlock(nn.Module):
    """1x1 conv + two recurrent blocks with residual (reference archs.py:1276-1292).

    Note the reference's Recurrent_block.forward runs the i==0 initialization
    and then t more gated steps (a subtle off-by-one kept here: t+1 conv
    applications per block, weights shared).
    """

    out_channels: int
    t: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.out_channels, 1, dtype=self.dtype, name="conv_1x1")(x)
        x1 = RecurrentBlock(self.out_channels, t=self.t, dtype=self.dtype,
                            name="rcnn1")(x, train)
        x1 = RecurrentBlock(self.out_channels, t=self.t, dtype=self.dtype,
                            name="rcnn2")(x1, train)
        return x + x1


class AttentionGate(nn.Module):
    """Additive attention gate: psi = sigmoid(conv(relu(W_g g + W_x x))), x*psi
    (reference archs.py:1293-1321)."""

    inter_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = TorchConv(self.inter_channels, 1, dtype=self.dtype, name="W_g_conv")(g)
        g1 = BatchNorm(dtype=self.dtype, name="W_g_bn")(g1, use_running_average=not train)
        x1 = TorchConv(self.inter_channels, 1, dtype=self.dtype, name="W_x_conv")(x)
        x1 = BatchNorm(dtype=self.dtype, name="W_x_bn")(x1, use_running_average=not train)
        psi = nn.relu(g1 + x1)
        psi = TorchConv(1, 1, dtype=self.dtype, name="psi_conv")(psi)
        psi = BatchNorm(dtype=self.dtype, name="psi_bn")(psi, use_running_average=not train)
        psi = nn.sigmoid(psi)
        return x * psi


class _EncDecUNet(nn.Module):
    """Shared 5-level encoder/decoder skeleton of the LeeJunHyun family."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; unused
    t: int = 2
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    recurrent: bool = False
    attention: bool = False
    dtype: Any = None

    def _enc_block(self, f, idx):
        if self.recurrent:
            return RRCNNBlock(f, t=self.t, dtype=self.dtype, name=f"RRCNN{idx}")
        return ConvBlock(f, dtype=self.dtype, name=f"Conv{idx}")

    def _dec_block(self, f, idx):
        if self.recurrent:
            return RRCNNBlock(f, t=self.t, dtype=self.dtype, name=f"Up_RRCNN{idx}")
        return ConvBlock(f, dtype=self.dtype, name=f"Up_conv{idx}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        fs = self.filters

        enc = []
        for i, f in enumerate(fs):
            if i > 0:
                x = max_pool2x2(x)
            x = self._enc_block(f, i + 1)(x, train)
            enc.append(x)

        d = enc[-1]
        for level in range(len(fs) - 1, 0, -1):  # 5..2 in reference naming
            skip = enc[level - 1]
            d = UpConv(fs[level - 1], dtype=self.dtype, name=f"Up{level + 1}")(d, train)
            if self.attention:
                skip = AttentionGate(max(fs[level - 1] // 2, 1), dtype=self.dtype,
                                     name=f"Att{level + 1}")(d, skip, train)
            d = jnp.concatenate([skip, d], axis=-1)
            d = self._dec_block(fs[level - 1], level + 1)(d, train)

        out = TorchConv(self.num_classes, 1, dtype=self.dtype, name="Conv_1x1")(d)
        return out.astype(jnp.float32)


class AttU_Net(_EncDecUNet):
    """Attention U-Net (reference archs.py:1402-1474)."""

    attention: bool = True


class R2U_Net(_EncDecUNet):
    """Recurrent-residual U-Net (intended model behind the dead reference code
    archs_backup.py:1856-1974; see module docstring)."""

    recurrent: bool = True


class R2AttU_Net(_EncDecUNet):
    """Recurrent-residual attention U-Net (reference archs.py:1322-1396)."""

    recurrent: bool = True
    attention: bool = True
