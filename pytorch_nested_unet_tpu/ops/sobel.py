"""Fixed-kernel Sobel edge maps (reference cascadePSP_model/sobel_op.py:7-45).

Used upstream for CascadePSP's boundary losses; the reference hardcodes
`.cuda()` for the kernels (sobel_op.py:14,19) — here they are constants baked
into the jitted computation, so placement follows the inputs. Per-channel
(depthwise) application via lax.conv with feature groups.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np
from jax import lax

_KX = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32) / 4.0
_KY = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32) / 4.0


def _depthwise3x3(x, kernel2d):
    c = x.shape[-1]
    k = jnp.asarray(kernel2d, x.dtype)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with feature_group_count=c
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def sobel(x, epsilon: float = 1e-4):
    """sqrt(gx^2 + gy^2 + eps) after a 3x3 average smoothing, NHWC
    (reference sobel_op.py:22-36; count_include_pad avg pool)."""
    ones = np.ones((3, 3), np.float32) / 9.0
    x = _depthwise3x3(x, ones)
    gx = _depthwise3x3(x, _KX)
    gy = _depthwise3x3(x, _KY)
    return jnp.sqrt(gx * gx + gy * gy + epsilon)


class SobelComputer:
    """compute_edges(images_dict) adds 'gt_sobel'/'pred_sobel'
    (reference sobel_op.py:38-45)."""

    def __init__(self, epsilon: float = 1e-4):
        self.epsilon = epsilon

    def compute_edges(self, images: Dict):
        images["gt_sobel"] = sobel(images["gt"], self.epsilon)
        images["pred_sobel"] = sobel(images["pred_224"], self.epsilon)
        return images
