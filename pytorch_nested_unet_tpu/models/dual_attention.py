"""DANet dual attention (PAM/CAM) + UNetRNN attention variants.

Reference: archs_backup.py:876-962 (PAM_Module, CAM_Module, Attention_block)
and the three models UNetRNN{P,C}Attention / UNetRNNAttention
(archs_backup.py:968-1394), which apply attention to each per-scale class-score
map before the RDC chain.

TPU-native notes and documented divergences from the reference (SURVEY.md §7
"quirk decisions" — rebuild the intended behavior):
  - The attention einsums ((HW)x(HW) and CxC grams) are batched matmuls that
    map straight onto the MXU; we use jnp.einsum over NHWC instead of
    permute+bmm over NCHW.
  - The reference constructs PAM_Module(filters[i]) but applies it to score
    maps with n_classes channels (archs_backup.py:997-1001 vs :1042-1052),
    which crashes in PyTorch whenever n_classes != filters[i]. We infer the
    channel count from the actual input and use max(C//8, 1) query/key
    channels, which is the intended "attention over score maps" behavior.
  - The reference's Attention_block instantiates fresh PAM/CAM modules inside
    `forward` (archs_backup.py:950-962) so their parameters are never trained;
    we register them as proper submodules.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import TorchConv
from .rdc import _UNetRNNBase


class PAMModule(nn.Module):
    """Position attention: softmax((Q K^T)) over H*W positions, gamma-gated
    residual (reference archs_backup.py:876-910)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        qk_ch = max(c // 8, 1)
        q = TorchConv(qk_ch, 1, dtype=self.dtype, name="query_conv")(x).reshape(b, h * w, qk_ch)
        k = TorchConv(qk_ch, 1, dtype=self.dtype, name="key_conv")(x).reshape(b, h * w, qk_ch)
        v = TorchConv(c, 1, dtype=self.dtype, name="value_conv")(x).reshape(b, h * w, c)
        energy = jnp.einsum("bqc,bkc->bqk", q, k)
        attention = jax.nn.softmax(energy.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attention, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class CAMModule(nn.Module):
    """Channel attention: CxC gram with max-subtraction trick, gamma-gated
    residual (reference archs_backup.py:913-947)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat).astype(jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attention = jax.nn.softmax(energy_new, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attention, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class DualAttentionBlock(nn.Module):
    """PAM(x) + CAM(x) sum (reference archs_backup.py:950-962, with the
    forward-time module construction bug fixed — see module docstring)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pa = PAMModule(dtype=self.dtype, name="pam")(x)
        ca = CAMModule(name="cam")(x)
        return pa + ca


class UNetRNNPAttention(_UNetRNNBase):
    """UNetRNN + position attention on each score map
    (reference archs_backup.py:968-1106)."""

    def attend(self, scores, train):
        return [PAMModule(dtype=self.dtype, name=f"PAM_Module{i + 1}")(s)
                for i, s in enumerate(scores)]


class UNetRNNCAttention(_UNetRNNBase):
    """UNetRNN + channel attention on each score map
    (reference archs_backup.py:1109-1250)."""

    def attend(self, scores, train):
        return [CAMModule(name=f"CAM_Module{i + 1}")(s)
                for i, s in enumerate(scores)]


class UNetRNNAttention(_UNetRNNBase):
    """UNetRNN + PAM+CAM sum on each score map
    (reference archs_backup.py:1256-1394)."""

    def attend(self, scores, train):
        return [DualAttentionBlock(dtype=self.dtype, name=f"attention_block{i + 1}")(s)
                for i, s in enumerate(scores)]
