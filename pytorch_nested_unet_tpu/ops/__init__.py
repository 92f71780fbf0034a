"""Low-level NHWC ops with PyTorch-matching semantics, built for XLA/TPU."""

from .resize import resize_bilinear, upsample2x, resize_nearest
from .pool import max_pool2x2, avg_pool2d, adaptive_avg_pool, adaptive_max_pool, global_avg_pool
from .layers import TorchConv, TorchConvTranspose, TorchDense, BatchNorm
from .init import torch_conv_kernel_init, torch_bias_init, torch_dense_kernel_init

__all__ = [
    "resize_bilinear", "upsample2x", "resize_nearest",
    "max_pool2x2", "avg_pool2d", "adaptive_avg_pool", "adaptive_max_pool",
    "global_avg_pool",
    "TorchConv", "TorchConvTranspose", "TorchDense", "BatchNorm",
    "torch_conv_kernel_init", "torch_bias_init", "torch_dense_kernel_init",
]
