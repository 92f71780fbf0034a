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


def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out, in) interpolation matrix for one axis (two taps per row)."""
    i0, i1, w = _axis_positions(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    idx = np.clip(np.floor(np.arange(out_size) * in_size / out_size), 0,
                  in_size - 1).astype(np.int64)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def _apply_axis_matrix(x, axis: int, m: np.ndarray):
    """Contract axis `axis` of x with the (out, in) matrix — a plain matmul.

    TPU-first formulation: resizing as two dense contractions runs on the MXU
    and, crucially, has a *matmul* VJP. The alternative gather formulation
    back-propagates as scatter-add, which is an order of magnitude slower on
    TPU in the training step (the decoder has 8+ upsamples in NestedUNet).
    """
    mj = jnp.asarray(m, jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype)
    y = jnp.tensordot(x, mj, axes=[[axis if axis >= 0 else x.ndim + axis], [1]])
    # tensordot moved the contracted axis to the end; move it back
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(x, out_hw, align_corners: bool = True):
    """Resize (..., H, W, C) to (..., out_h, out_w, C).

    Matches `torch.nn.functional.interpolate(mode='bilinear', align_corners=...)`
    in float32 up to summation order.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w_sz = x.shape[-3], x.shape[-2]
    if (h, w_sz) == (out_h, out_w):
        return x
    if h != out_h:
        x = _apply_axis_matrix(x, x.ndim - 3, _interp_matrix(h, out_h, align_corners))
    if w_sz != out_w:
        x = _apply_axis_matrix(x, x.ndim - 2, _interp_matrix(w_sz, out_w, align_corners))
    return x


def resize_nearest(x, out_hw):
    """Nearest resize matching torch `interpolate(mode='nearest')` (floor indexing)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w_sz = x.shape[-3], x.shape[-2]
    if (h, w_sz) == (out_h, out_w):
        return x
    if h != out_h:
        x = _apply_axis_matrix(x, x.ndim - 3, _nearest_matrix(h, out_h))
    if w_sz != out_w:
        x = _apply_axis_matrix(x, x.ndim - 2, _nearest_matrix(w_sz, out_w))
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
