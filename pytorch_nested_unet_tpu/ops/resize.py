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


def resize_area(x, out_hw):
    """`F.interpolate(mode='area')` — torch implements it as adaptive average
    pooling (used by the CascadePSP driver's downscales, eval_helper.py:9-11)."""
    from .pool import adaptive_avg_pool

    return adaptive_avg_pool(x, out_hw)


def _cubic_kernel(t, a: float = -0.75):
    """Cubic convolution kernel (Keys), torch's bicubic with a=-0.75."""
    at = np.abs(t)
    at2, at3 = at * at, at * at * at
    w = np.where(at <= 1,
                 (a + 2) * at3 - (a + 3) * at2 + 1,
                 np.where(at < 2, a * at3 - 5 * a * at2 + 8 * a * at - 4 * a, 0.0))
    return w


def resize_bicubic(x, out_hw, align_corners: bool = False):
    """Separable bicubic resize matching `F.interpolate(mode='bicubic')`
    (border-clamped 4-tap cubic, half-pixel centers when align_corners=False).
    Used by the CascadePSP driver's upscales (eval_helper.py:9-11)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])

    def axis(x, ax, in_size, out_size):
        if in_size == out_size:
            return x
        out_idx = np.arange(out_size, dtype=np.float64)
        if align_corners and out_size > 1:
            pos = out_idx * (in_size - 1) / (out_size - 1)
        else:
            pos = (out_idx + 0.5) * in_size / out_size - 0.5
        i0 = np.floor(pos).astype(np.int64)
        taps, weights = [], []
        for k in (-1, 0, 1, 2):
            idx = np.clip(i0 + k, 0, in_size - 1)
            taps.append(idx.astype(np.int32))
            weights.append(_cubic_kernel(pos - (i0 + k)).astype(np.float32))
        shape = [1] * x.ndim
        shape[ax] = -1
        acc = 0.0
        for idx, w in zip(taps, weights):
            acc = acc + jnp.take(x, jnp.asarray(idx), axis=ax) * \
                jnp.asarray(w, x.dtype).reshape(shape)
        return acc

    x = axis(x, x.ndim - 3, x.shape[-3], out_h)
    x = axis(x, x.ndim - 2, x.shape[-2], out_w)
    return x
