"""CRDN family: Recurrent Decoding Cell (RDC) and RNN-decoder UNets.

Reference: archs_backup.py:155-361 (RDC, UNetRNN), :621-871 (UNetRM3/UNetRM7)
and the cleaner original CRDN.py:8-199. "Segmenting Medical MRI via Recurrent
Decoding Cell" — the decoder replaces skip-concat with a ConvLSTM/ConvGRU/
vanilla-RNN cell over per-scale class-score maps, decoding coarse→fine.

TPU-native design notes:
  - NHWC throughout; the carry is upsampled with align-corners bilinear
    (ops.resize) matching `F.interpolate(..., align_corners=True)`
    (reference archs_backup.py:180-185).
  - The chain is a 5-step (3/7 for RM3/RM7) unrolled loop: the carry changes
    spatial shape every step, so unrolling (static shapes per step) is the
    XLA-friendly formulation rather than lax.scan (SURVEY.md §7 "hard parts").
  - No device pinning: the reference hardcodes `.cuda(0)` for the initial cell
    state (archs_backup.py:360-361); here h0 is just `jnp.zeros` and follows
    the sharding of its consumers.
  - Padding: the reference's archs_backup RDC hardcodes padding=1
    (archs_backup.py:167) while CRDN.py uses kernel_size//2 (CRDN.py:20);
    identical for the default kernel_size=3. We use kernel_size//2.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.layers import TorchConv
from ..ops.pool import max_pool2x2
from ..ops.resize import resize_bilinear
from ..ops.small_conv import ShiftConv
from .blocks import ConvBNReLU, UnetConv2

DECODERS = ("LSTM", "GRU", "vanilla")
CONV_IMPLS = ("auto", "mxu", "shift")


class RDC(nn.Module):
    """Recurrent Decoding Cell (reference archs_backup.py:155-227, CRDN.py:8-71).

    Operates on class-logit maps (hidden_dim = n_classes). The previous carry is
    bilinearly upsampled (align_corners=True) to the current scale, then merged
    by gated convolutions. One shared cell is reused across all pyramid levels
    (the reference holds a single `self.RDC`).
    """

    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    decoder: str = "GRU"
    conv_impl: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, x_cur, h_pre, c_pre=None):
        if self.decoder not in DECODERS:
            raise NotImplementedError(self.decoder)
        if self.conv_impl not in CONV_IMPLS:
            raise NotImplementedError(self.conv_impl)
        hw = (x_cur.shape[-3], x_cur.shape[-2])
        pad = self.kernel_size // 2
        cin = 2 * self.hidden_dim  # every cell conv sees [h_up ++ x]

        def conv(feats, name):
            # Tiny channel counts (hidden_dim = n_classes, usually 1) pad the
            # MXU's 128-lane tiles to ~1% utilization; lower those as VPU
            # shift-sum convs instead (ops/small_conv.py) — same math, same
            # param tree, fused with the gating arithmetic. VERDICT.md weak #4.
            shift = (self.conv_impl == "shift"
                     or (self.conv_impl == "auto" and cin * feats <= 64))
            if shift:
                return ShiftConv(feats, self.kernel_size, padding=pad,
                                 use_bias=self.use_bias, dtype=self.dtype,
                                 name=name)
            return TorchConv(feats, self.kernel_size, padding=pad,
                             use_bias=self.use_bias, dtype=self.dtype,
                             name=name)

        h_pre_up = resize_bilinear(h_pre, hw, align_corners=True)

        if self.decoder == "LSTM":
            c_pre_up = resize_bilinear(c_pre, hw, align_corners=True)
            combined = jnp.concatenate([h_pre_up, x_cur], axis=-1)
            gates = conv(self.hidden_dim * 4, "lstm_catconv")(combined)
            cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
            i = nn.sigmoid(cc_i)
            f = nn.sigmoid(cc_f)
            o = nn.sigmoid(cc_o)
            g = nn.tanh(cc_g)
            c_cur = f * c_pre_up + i * g
            h_cur = o * nn.tanh(c_cur)
            return h_cur, c_cur

        if self.decoder == "GRU":
            combined = jnp.concatenate([h_pre_up, x_cur], axis=-1)
            rz = conv(self.hidden_dim * 2, "gru_catconv")(combined)
            cc_r, cc_z = jnp.split(rz, 2, axis=-1)
            r = nn.sigmoid(cc_r)
            z = nn.sigmoid(cc_z)
            h_hat = nn.tanh(conv(self.hidden_dim, "gru_conv")(
                jnp.concatenate([x_cur, r * h_pre_up], axis=-1)))
            return z * h_pre_up + (1.0 - z) * h_hat

        # vanilla
        combined = jnp.concatenate([h_pre_up, x_cur], axis=-1)
        return nn.relu(conv(self.hidden_dim, "vanilla_conv")(combined))


def rdc_decode(rdc: RDC, scores: Sequence[jnp.ndarray], decoder: str):
    """Run the shared RDC cell over coarse→fine score maps (unrolled chain).

    Reference: archs_backup.py:326-358 (h0 = zeros like the coarsest map,
    then h_{k} = RDC(x_k, h_{k-1})), returning the final full-res logits.
    """
    h = jnp.zeros_like(scores[0])
    if decoder == "LSTM":
        c = jnp.zeros_like(h)
        for x in scores:
            h, c = rdc(x, h, c)
    else:
        for x in scores:
            h = rdc(x, h)
    return h


class _UNetRNNBase(nn.Module):
    """Shared skeleton: unetConv2 encoder column + per-level 5x5 score blocks
    + RDC chain. Subclasses set `filters` and optionally override score/attention
    hooks. Reference: archs_backup.py:234-361."""

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # accepted for registry uniformity; unused
    kernel_size: int = 3
    feature_scale: int = 4
    decoder: str = "GRU"
    conv_impl: str = "auto"  # RDC cell lowering: auto|mxu|shift (see RDC)
    use_bias: bool = True
    dtype: Any = None

    base_filters: Sequence[int] = (64, 128, 256, 512, 1024)

    def encode(self, x, train):
        """unetConv2 -> [pool -> unetConv2]xN (reference archs_backup.py:299-311)."""
        filters = [int(f / self.feature_scale) for f in self.base_filters]
        feats = []
        for i, f in enumerate(filters):
            if i > 0:
                x = max_pool2x2(x)
            x = UnetConv2(f, is_batchnorm=True, dtype=self.dtype,
                          name=f"conv{i + 1}")(x, train)
            feats.append(x)
        return feats

    def score(self, feats, train):
        """conv5x5 -> BN -> ReLU to n_classes at each scale, coarse→fine
        (reference archs_backup.py:313-321, score_block5(conv5) first)."""
        scores = []
        for i, f in enumerate(reversed(feats)):  # coarsest first
            blk = ConvBNReLU(self.num_classes, kernel_size=5, padding=2,
                             dtype=self.dtype,
                             name=f"score_block{len(feats) - i}")
            scores.append(blk(f, train))
        return scores

    def attend(self, scores, train):
        """Hook for the attention variants (identity here)."""
        return scores

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = self.encode(x, train)
        scores = self.attend(self.score(feats, train), train)
        rdc = RDC(self.num_classes, self.kernel_size, use_bias=self.use_bias,
                  decoder=self.decoder, conv_impl=self.conv_impl,
                  dtype=self.dtype, name="RDC")
        h = rdc_decode(rdc, scores, self.decoder)
        return h.astype(jnp.float32)


class UNetRNN(_UNetRNNBase):
    """CRDN with UNet backbone, filters [16,32,64,128,256] at feature_scale=4.

    Reference: archs_backup.py:234-361 (GRU default), CRDN.py:78-199.
    """


class UNetRM3(_UNetRNNBase):
    """3-level depth ablation, filters [64,288,512]/scale (reference
    archs_backup.py:621-715)."""

    base_filters: Sequence[int] = (64, 288, 512)


class UNetRM7(_UNetRNNBase):
    """7-level depth ablation, filters [32..2048]/scale (reference
    archs_backup.py:717-871)."""

    base_filters: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048)
