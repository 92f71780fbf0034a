"""Flax layers with PyTorch-default semantics (init, padding, BN behavior).

These are the building blocks the entire model zoo is written in. NHWC layout
(TPU-native). `dtype` controls the compute dtype (bf16 mixed precision on TPU);
parameters are always stored float32. BatchNorm always computes statistics in
float32 regardless of compute dtype.
"""

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from .init import (
    torch_bias_init,
    torch_conv_kernel_init,
    torch_dense_kernel_init,
    torch_transpose_kernel_init,
)

IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


class TorchConv(nn.Module):
    """`nn.Conv2d` equivalent: explicit symmetric padding, kaiming-uniform init.

    Matches the reference's conv calls, e.g. conv3x3 padding=1 in VGGBlock
    (reference archs_backup.py:24-42) and 5x5 score blocks (archs_backup.py:313-321).
    """

    features: int
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: IntPair = 0
    dilation: IntPair = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        fan_in = kh * kw * x.shape[-1] // self.groups
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class TorchConvTranspose(nn.Module):
    """`nn.ConvTranspose2d` equivalent (used by up_conv variants and PSP heads).

    PyTorch output size = (in-1)*stride - 2*pad + kernel; we reproduce that via
    flax ConvTranspose with explicit padding trim.
    """

    features: int
    kernel_size: IntPair = 2
    stride: IntPair = 2
    padding: IntPair = 0
    output_padding: IntPair = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        fan_in = kh * kw * self.features
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.stride),
            padding=((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)),
            use_bias=self.use_bias,
            kernel_init=torch_transpose_kernel_init,
            bias_init=torch_bias_init(fan_in),
            transpose_kernel=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return y


class TorchDense(nn.Module):
    """`nn.Linear` equivalent."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=torch_dense_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dense",
        )(x)


class _TorchBN(nn.Module):
    """Inner BN with torch-exact statistics semantics.

    Differs from flax `nn.BatchNorm` in one place: the running-variance EMA
    uses the *unbiased* batch variance (x n/(n-1)) like torch BatchNorm2d,
    while normalization uses the biased variance — flax updates the running
    stat with the biased value. Param/stat names (scale/bias, mean/var) and
    init match nn.BatchNorm so checkpoints and converters are unaffected.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=red)
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
            var = jnp.mean(jnp.square(x - mean), axis=red)
            if self.axis_name is not None:
                var = lax.pmean(var, self.axis_name)
            # element count behind each statistic: global under GSPMD (x has
            # the logical global shape inside jit), local x replicas under an
            # explicit axis_name (shard_map/pmap)
            n = x.size // f
            if self.axis_name is not None:
                n = n * lax.psum(1, self.axis_name)
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))  # torch running-var
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        inv = lax.rsqrt(var + self.epsilon)
        return (x - mean) * (inv * scale) + bias


class BatchNorm(nn.Module):
    """`nn.BatchNorm2d` equivalent: momentum 0.1 (flax 0.9), eps 1e-5, affine,
    torch-style unbiased running variance (see _TorchBN).

    Replaces both torch BN and the reference's vendored SyncBN
    (reference cascadePSP_model/sync_batchnorm/batchnorm.py:48-120): under pjit/GSPMD
    the batch mean/var reductions over a sharded batch axis are *global* — XLA
    inserts the ICI all-reduce — so synchronized BN falls out for free. Under
    shard_map/pmap, pass `axis_name` to sync explicitly.

    Statistics are always computed in float32.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        out_dtype = x.dtype if self.dtype is None else self.dtype
        ura = self.use_running_average if use_running_average is None else use_running_average
        y = _TorchBN(
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            name="bn",
        )(x.astype(jnp.float32), ura)
        return y.astype(out_dtype)
