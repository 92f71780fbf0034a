"""Shift-sum convolution for tiny channel counts (the RDC decode chain).

Why: the CRDN family's recurrent decoder runs 3x3/5x5 convolutions over
`n_classes`-channel maps (1-4 channels, reference archs_backup.py:155-227).
On TPU, XLA lowers those to MXU convolutions whose 128-lane output tiles are
~1% utilized — the RDC archs measured only 68% of the naive HBM roofline in
round 1 (VERDICT.md weak #4). A k x k conv over C_in channels is also exactly

    y[..., o] = sum_{dy,dx,i} kernel[dy,dx,i,o] * shift(x, dy, dx)[..., i]

i.e. k*k*C_in elementwise multiply-adds over shifted slabs — pure VPU
streaming that XLA fuses into one HBM pass together with the surrounding
gating arithmetic (sigmoid/tanh/lerp), with no MXU padding waste. The math is
identical (reassociated f32 sums), so parity tests hold at float tolerance.

`ShiftConv` exposes the same param tree as ops.layers.TorchConv
(`<name>/conv/{kernel,bias}`, HWIO / kaiming-uniform), so checkpoints and
torch transplants are byte-compatible either way; `RDC(conv_impl=...)` picks
the implementation ('auto' = shift when the contraction is tiny).
"""

from typing import Any, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from .init import torch_bias_init, torch_conv_kernel_init

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def shift_conv2d(x, kernel, padding: IntPair = 0):
    """NHWC 'same-math' convolution via k*k shifted multiply-adds.

    x: (..., H, W, C_in); kernel: (kh, kw, C_in, C_out); stride 1, dilation 1.
    Output spatial size matches a torch conv with the given symmetric padding.
    Unrolled statically over the k*k taps — everything fuses to elementwise.
    """
    kh, kw, cin, cout = kernel.shape
    ph, pw = _pair(padding)
    assert x.shape[-1] == cin, (x.shape, kernel.shape)
    pad_cfg = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    xp = jnp.pad(x, pad_cfg)
    H = x.shape[-3] + 2 * ph - kh + 1
    W = x.shape[-2] + 2 * pw - kw + 1
    out = None
    for dy in range(kh):
        for dx in range(kw):
            slab = xp[..., dy:dy + H, dx:dx + W, :]
            # (..., H, W, cin) x (cin, cout) — with tiny cin/cout XLA keeps
            # this on the VPU fused with the adds
            term = jnp.tensordot(slab, kernel[dy, dx], axes=([-1], [0]))
            out = term if out is None else out + term
    return out


class _ShiftConvParams(nn.Module):
    """Param holder + compute, scoped as 'conv' to mirror nn.Conv's tree."""

    features: int
    kernel_size: Tuple[int, int]
    padding: IntPair
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (kh, kw, cin, self.features), jnp.float32)
        y = shift_conv2d(x, kernel.astype(x.dtype), self.padding)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(kh * kw * cin),
                              (self.features,), jnp.float32)
            y = y + bias.astype(x.dtype)
        return y


class ShiftConv(nn.Module):
    """Drop-in for TorchConv (stride 1 / dilation 1 / no groups) with the
    identical param tree (`<name>/conv/{kernel,bias}`), lowered as shift-sum
    instead of an MXU conv."""

    features: int
    kernel_size: IntPair = 3
    padding: IntPair = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return _ShiftConvParams(self.features, _pair(self.kernel_size),
                                self.padding, self.use_bias, name="conv")(x)
