"""Bilinear/nearest resize with PyTorch `F.interpolate` semantics, NHWC.

The reference decoder upsamples with `nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)` (reference archs_backup.py:93) and the RDC cell resizes the
carry with `F.interpolate(..., align_corners=True)` (reference archs_backup.py:180-185).
`jax.image.resize` uses half-pixel centers, which shifts decoder features by up to
half a pixel per level — so we implement align-corners interpolation explicitly as
two separable gather+lerp passes. Static output sizes keep everything jit-friendly.
"""

import jax.numpy as jnp
import numpy as np


def _axis_positions(in_size: int, out_size: int, align_corners: bool):
    """Source sampling positions for each output index along one axis (host-side)."""
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            pos = np.zeros(1, dtype=np.float64)
        else:
            pos = out_idx * (in_size - 1) / (out_size - 1)
    else:
        pos = (out_idx + 0.5) * in_size / out_size - 0.5
        pos = np.clip(pos, 0.0, in_size - 1)
    i0 = np.floor(pos).astype(np.int32)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1).astype(np.int32)
    w = (pos - i0).astype(np.float32)
    return i0, i1, w


def _interp_axis(x, axis: int, i0, i1, w):
    lo = jnp.take(x, jnp.asarray(i0), axis=axis)
    hi = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = jnp.asarray(w, dtype=x.dtype).reshape(shape)
    return lo + (hi - lo) * w


def resize_bilinear(x, out_hw, align_corners: bool = True):
    """Resize (..., H, W, C) to (..., out_h, out_w, C).

    Matches `torch.nn.functional.interpolate(mode='bilinear', align_corners=...)`
    bit-for-bit in float32 up to summation order.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w_sz = x.shape[-3], x.shape[-2]
    if (h, w_sz) == (out_h, out_w):
        return x
    if h != out_h:
        i0, i1, w = _axis_positions(h, out_h, align_corners)
        x = _interp_axis(x, x.ndim - 3, i0, i1, w)
    if w_sz != out_w:
        i0, i1, w = _axis_positions(w_sz, out_w, align_corners)
        x = _interp_axis(x, x.ndim - 2, i0, i1, w)
    return x


def resize_nearest(x, out_hw):
    """Nearest resize matching torch `interpolate(mode='nearest')` (floor indexing)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w_sz = x.shape[-3], x.shape[-2]
    if (h, w_sz) == (out_h, out_w):
        return x
    idx_h = np.floor(np.arange(out_h) * h / out_h).astype(np.int32)
    idx_w = np.floor(np.arange(out_w) * w_sz / out_w).astype(np.int32)
    x = jnp.take(x, jnp.asarray(np.clip(idx_h, 0, h - 1)), axis=x.ndim - 3)
    x = jnp.take(x, jnp.asarray(np.clip(idx_w, 0, w_sz - 1)), axis=x.ndim - 2)
    return x


def upsample2x(x, align_corners: bool = True):
    """2x bilinear upsample, the decoder hot path (reference archs_backup.py:93)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners)
