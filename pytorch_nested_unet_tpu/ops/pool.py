"""Pooling ops (NHWC) with PyTorch semantics, lowered through lax.reduce_window."""

import jax.numpy as jnp
import numpy as np
from jax import lax


def max_pool2x2(x):
    """`nn.MaxPool2d(2)`: kernel 2, stride 2, floor mode (reference archs_backup.py:92).

    TPU-first formulation: reshape + max over the 2x2 sub-axes. Its VJP is an
    elementwise equality mask, unlike reduce_window whose VJP lowers to
    select_and_scatter — one of the slowest ops on TPU and it sits in the
    backward pass of every encoder level.
    """
    h, w = x.shape[-3], x.shape[-2]
    if h % 2 or w % 2:  # floor mode drops the odd edge row/col
        x = x[..., : h - h % 2, : w - w % 2, :]
        h, w = x.shape[-3], x.shape[-2]
    lead = x.shape[:-3]
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, x.shape[-1])
    return jnp.max(x, axis=(-4, -2))


def max_pool_3x3_s2_p1(x):
    """`nn.MaxPool2d(3, stride=2, padding=1)` — the ResNet stem pool."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, neg, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             ((0, 0), (1, 1), (1, 1), (0, 0)))


def avg_pool2d(x, window, stride=None, padding="VALID"):
    """Average pool with count_include_pad=True torch semantics for VALID windows."""
    stride = stride or window
    summed = lax.reduce_window(
        x, jnp.array(0, x.dtype), lax.add,
        (1, window[0], window[1], 1), (1, stride[0], stride[1], 1), padding,
    )
    return summed / (window[0] * window[1])


def _adaptive_bins(in_size: int, out_size: int):
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int32)
    return starts, ends


def adaptive_avg_pool(x, out_hw):
    """`nn.AdaptiveAvgPool2d(out_hw)` semantics via integral images (exact, static).

    Needed by the PSP pooling module sizes (1,2,3,6) (reference pspnet.py:8-26) and
    CA-Net's SE blocks (reference archs.py:614-628).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]

    def pool_axis(x, axis, in_size, out_size):
        if in_size == out_size:
            return x
        starts, ends = _adaptive_bins(in_size, out_size)
        cs = jnp.cumsum(x, axis=axis)
        zero_shape = list(x.shape)
        zero_shape[axis] = 1
        cs = jnp.concatenate([jnp.zeros(zero_shape, x.dtype), cs], axis=axis)
        hi = jnp.take(cs, jnp.asarray(ends), axis=axis)
        lo = jnp.take(cs, jnp.asarray(starts), axis=axis)
        counts = jnp.asarray((ends - starts).astype(np.float32))
        shape = [1] * x.ndim
        shape[axis] = -1
        return (hi - lo) / counts.reshape(shape).astype(x.dtype)

    x = pool_axis(x, x.ndim - 3, h, out_h)
    x = pool_axis(x, x.ndim - 2, w, out_w)
    return x


def adaptive_max_pool(x, out_hw):
    """`nn.AdaptiveMaxPool2d` semantics. Used by CA-Net SE blocks (archs.py:618)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[-3], x.shape[-2]

    def pool_axis(x, axis, in_size, out_size):
        if in_size == out_size:
            return x
        starts, ends = _adaptive_bins(in_size, out_size)
        pieces = []
        for s, e in zip(starts, ends):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(int(s), int(e))
            pieces.append(jnp.max(x[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, x.ndim - 3, h, out_h)
    x = pool_axis(x, x.ndim - 2, w, out_w)
    return x


def global_avg_pool(x, keepdims=True):
    return jnp.mean(x, axis=(-3, -2), keepdims=keepdims)
