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
    residual (reference archs_backup.py:876-910).

    fast_rank1 (opt-in, default off = exact reference math): when the
    query/key depth is 1 — which is the case whenever PAM runs on class-score
    maps, c//8 < 1 — the attention scores are RANK-1 (s_ij = t_i * k_j), so
    every softmax row evaluates the SAME scalar function

        f(t) = sum_j e^{t k_j} v_j / sum_j e^{t k_j}

    at its own t_i. A device trace (README "Where the time actually goes")
    showed the exact path is VPU-transcendental-bound with ~zero HBM traffic
    — XLA already streams the (HW)^2 gram inside fusions — so the only
    remaining lever is this algebraic one: evaluate f on a `grid_size`-point
    grid spanning [min t, max t] (per batch element) and linearly interpolate
    per row. exp count drops from (HW)^2 to grid_size*HW (~36x fewer at 96x96
    with the default grid). This is an APPROXIMATION (piecewise-linear in t);
    tests pin its error against the exact path. Ignored when qk_ch > 1 (the
    scores are no longer rank-1)."""

    dtype: Any = None
    fast_rank1: bool = False
    grid_size: int = 256

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        qk_ch = max(c // 8, 1)
        q = TorchConv(qk_ch, 1, dtype=self.dtype, name="query_conv")(x).reshape(b, h * w, qk_ch)
        k = TorchConv(qk_ch, 1, dtype=self.dtype, name="key_conv")(x).reshape(b, h * w, qk_ch)
        v = TorchConv(c, 1, dtype=self.dtype, name="value_conv")(x).reshape(b, h * w, c)
        if self.fast_rank1 and qk_ch == 1:
            out = _rank1_attention_interp(q[..., 0], k[..., 0], v,
                                          self.grid_size).reshape(b, h, w, c)
        else:
            energy = jnp.einsum("bqc,bkc->bqk", q, k)
            attention = jax.nn.softmax(energy.astype(jnp.float32),
                                       axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attention, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


def _rank1_attention_interp(t, k, v, grid_size):
    """softmax(t_i * k_j) @ v for scalar queries/keys via a shared 1-D
    function: evaluate f on a per-batch uniform grid over [min t, max t],
    then piecewise-linear interpolate each row at its t_i.

    t: (B, N) query scalars; k: (B, N) key scalars; v: (B, N, C).
    Returns (B, N, C) in v.dtype. All softmax math in f32 (the exact path
    does the same)."""
    b, n = t.shape
    tf = t.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    lo = jnp.min(tf, axis=1, keepdims=True)              # (B, 1)
    hi = jnp.max(tf, axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    g = lo + span * jnp.linspace(0.0, 1.0, grid_size)[None, :]   # (B, G)
    # scores on the grid: (B, G, N); stable softmax over N
    s = g[:, :, None] * kf[:, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1)                          # (B, G)
    numer = jnp.einsum("bgn,bnc->bgc", e, vf)            # (B, G, C)
    f_grid = numer / denom[:, :, None]                   # (B, G, C)
    # interpolate each row's t_i on the grid
    pos = (tf - lo) / span * (grid_size - 1)             # (B, N) in [0, G-1]
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, grid_size - 2)
    frac = (pos - i0.astype(jnp.float32))[..., None]     # (B, N, 1)
    c = f_grid.shape[-1]
    idx0 = jnp.broadcast_to(i0[:, :, None], (b, n, c))
    f0 = jnp.take_along_axis(f_grid, idx0, axis=1)
    f1 = jnp.take_along_axis(f_grid, idx0 + 1, axis=1)
    return ((1.0 - frac) * f0 + frac * f1).astype(v.dtype)


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
    fast_pam: bool = False
    pam_grid: int = 256

    @nn.compact
    def __call__(self, x):
        pa = PAMModule(dtype=self.dtype, fast_rank1=self.fast_pam,
                       grid_size=self.pam_grid, name="pam")(x)
        ca = CAMModule(name="cam")(x)
        return pa + ca


class UNetRNNPAttention(_UNetRNNBase):
    """UNetRNN + position attention on each score map
    (reference archs_backup.py:968-1106).

    fast_pam=True opts into the rank-1 grid-interpolated PAM (approximate —
    see PAMModule.fast_rank1); exact by default."""

    fast_pam: bool = False
    pam_grid: int = 256

    def attend(self, scores, train):
        return [PAMModule(dtype=self.dtype, fast_rank1=self.fast_pam,
                          grid_size=self.pam_grid,
                          name=f"PAM_Module{i + 1}")(s)
                for i, s in enumerate(scores)]


class UNetRNNCAttention(_UNetRNNBase):
    """UNetRNN + channel attention on each score map
    (reference archs_backup.py:1109-1250)."""

    def attend(self, scores, train):
        return [CAMModule(name=f"CAM_Module{i + 1}")(s)
                for i, s in enumerate(scores)]


class UNetRNNAttention(_UNetRNNBase):
    """UNetRNN + PAM+CAM sum on each score map
    (reference archs_backup.py:1256-1394).

    fast_pam=True opts into the rank-1 grid-interpolated PAM (approximate —
    see PAMModule.fast_rank1); exact by default."""

    fast_pam: bool = False
    pam_grid: int = 256

    def attend(self, scores, train):
        return [DualAttentionBlock(dtype=self.dtype, fast_pam=self.fast_pam,
                                   pam_grid=self.pam_grid,
                                   name=f"attention_block{i + 1}")(s)
                for i, s in enumerate(scores)]
