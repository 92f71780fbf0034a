"""Plain U-Net (reference archs_backup.py:46-81), NHWC / TPU-native."""

from typing import Any, Sequence

import flax.linen as nn

import jax.numpy as jnp

from ..ops.layers import TorchConv
from ..ops.pool import max_pool2x2
from ..ops.resize import upsample2x
from .blocks import VGGBlock


class UNet(nn.Module):
    """5-level encoder/decoder with bilinear align-corners upsampling.

    nb_filter = [32, 64, 128, 256, 512]; MaxPool 2x2 down, bilinear x2 up with
    align_corners=True, skip concat, 1x1 head. Reference: archs_backup.py:46-81.
    """

    num_classes: int = 1
    input_channels: int = 3
    deep_supervision: bool = False  # accepted for registry uniformity; unused
    nb_filter: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        nb = self.nb_filter
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        x0_0 = VGGBlock(nb[0], nb[0], dtype=dt, name="conv0_0")(x, train)
        x1_0 = VGGBlock(nb[1], nb[1], dtype=dt, name="conv1_0")(max_pool2x2(x0_0), train)
        x2_0 = VGGBlock(nb[2], nb[2], dtype=dt, name="conv2_0")(max_pool2x2(x1_0), train)
        x3_0 = VGGBlock(nb[3], nb[3], dtype=dt, name="conv3_0")(max_pool2x2(x2_0), train)
        x4_0 = VGGBlock(nb[4], nb[4], dtype=dt, name="conv4_0")(max_pool2x2(x3_0), train)

        # Parts tuple, not a pre-concatenated tensor: VGGBlock's first conv is
        # MultipartConv3x3 (same params/math; Pallas-fusable when enabled).
        cat = lambda *ts: tuple(ts)
        x3_1 = VGGBlock(nb[3], nb[3], dtype=dt, name="conv3_1")(cat(x3_0, upsample2x(x4_0)), train)
        x2_2 = VGGBlock(nb[2], nb[2], dtype=dt, name="conv2_2")(cat(x2_0, upsample2x(x3_1)), train)
        x1_3 = VGGBlock(nb[1], nb[1], dtype=dt, name="conv1_3")(cat(x1_0, upsample2x(x2_2)), train)
        x0_4 = VGGBlock(nb[0], nb[0], dtype=dt, name="conv0_4")(cat(x0_0, upsample2x(x1_3)), train)

        out = TorchConv(self.num_classes, 1, dtype=dt, name="final")(x0_4)
        return out.astype(jnp.float32)
