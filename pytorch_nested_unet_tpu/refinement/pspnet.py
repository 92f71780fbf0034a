"""CascadePSP RefinementModule: 6-channel dilated ResNet-50 + PSP + 3-pass cascade.

Reference: segmentation-refinement/segmentation_refinement/models/psp/pspnet.py:1-171
and extractors.py:14-107. The repo vendors the same network twice — once with
plain BatchNorm (segmentation_refinement) and once with SynchronizedBatchNorm
(cascadePSP_model/psp/pspnet.py:66-172) for thread-based multi-GPU DataParallel.
Here there is ONE implementation: flax BatchNorm reductions are global over a
GSPMD-sharded batch axis (XLA inserts the ICI all-reduce), so the synchronized
variant is the same module trained under a mesh — the entire vendored
master/slave queue protocol (sync_batchnorm/comm.py:18-129) has no equivalent
and needs none (SURVEY.md §2.5).

NHWC; module names mirror the released torch checkpoint's state_dict keys so
`refiner.convert_torch_state_dict` is a mechanical rename (see refiner.py).
"""

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv
from ..ops.pool import adaptive_avg_pool
from ..ops.resize import resize_bilinear
from ..ops.pool import max_pool_3x3_s2_p1


class DilatedBottleneck(nn.Module):
    """ResNet bottleneck with dilation on conv2 (reference extractors.py:14-50)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = TorchConv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, 3, stride=self.stride, padding=self.dilation,
                        dilation=self.dilation, use_bias=False, dtype=self.dtype,
                        name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, 1, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = TorchConv(self.planes * 4, 1, stride=self.stride, use_bias=False,
                                 dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(out + residual)


class DilatedResNet50(nn.Module):
    """6-channel-input dilated ResNet-50 trunk (reference extractors.py:53-107):
    stride-2 7x7 stem on (image ++ 3 seg channels), layers 3/4 dilated 2/4 with
    stride 1, so the output stride stays 8. Returns (f, f_1, f_2) =
    (layer4 output, stem conv output at /2, layer1 output at /4)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_1 = TorchConv(64, 7, stride=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(dtype=self.dtype, name="bn1")(x_1, use_running_average=not train)
        h = nn.relu(h)
        h = max_pool_3x3_s2_p1(h)

        inplanes = 64
        feats = {}
        stage_cfg = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        for stage, ((planes, stride, dilation), n) in enumerate(zip(stage_cfg, self.layers)):
            for i in range(n):
                s = stride if i == 0 else 1
                d = 1 if i == 0 else dilation  # first block of a stage is undilated
                ds = i == 0 and (s != 1 or inplanes != planes * 4)
                h = DilatedBottleneck(planes, stride=s, dilation=d, downsample=ds,
                                      dtype=self.dtype,
                                      name=f"layer{stage + 1}_{i}")(h, train)
                inplanes = planes * 4
            feats[stage + 1] = h
        return h, x_1, feats[1]


class PSPModule(nn.Module):
    """Pyramid pooling at sizes (1,2,3,6) + 1x1 bottleneck
    (reference pspnet.py:8-26)."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        h, w = feats.shape[-3], feats.shape[-2]
        features = feats.shape[-1]
        priors = []
        for k, size in enumerate(self.sizes):
            p = adaptive_avg_pool(feats, (size, size))
            p = TorchConv(features, 1, use_bias=False, dtype=self.dtype,
                          name=f"stage{k}_conv")(p)
            priors.append(resize_bilinear(p, (h, w), align_corners=False))
        priors.append(feats)
        bottle = TorchConv(self.out_features, 1, dtype=self.dtype,
                           name="bottleneck")(jnp.concatenate(priors, axis=-1))
        return nn.relu(bottle)


class PSPUpsample(nn.Module):
    """2x upsample + double residual conv stack (reference pspnet.py:29-62).
    Sub-module names carry the torch Sequential indices (conv_0 = BN at
    `conv.0`, conv_2 = Conv at `conv.2`, ...) for checkpoint conversion."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, up, train: bool = False):
        x = resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=False)
        p = jnp.concatenate([x, up], axis=-1)
        p = BatchNorm(dtype=self.dtype, name="conv_0")(p, use_running_average=not train)
        p = nn.relu(p)
        p = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv_2")(p)
        p = BatchNorm(dtype=self.dtype, name="conv_3")(p, use_running_average=not train)
        p = nn.relu(p)
        p = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv_5")(p)

        sc = TorchConv(self.out_channels, 1, dtype=self.dtype, name="shortcut")(x)
        p = p + sc

        p2 = BatchNorm(dtype=self.dtype, name="conv2_0")(p, use_running_average=not train)
        p2 = nn.relu(p2)
        p2 = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2_2")(p2)
        p2 = BatchNorm(dtype=self.dtype, name="conv2_3")(p2, use_running_average=not train)
        p2 = nn.relu(p2)
        p2 = TorchConv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2_5")(p2)
        return p + p2


class RefinementModule(nn.Module):
    """3-pass cascade (reference pspnet.py:65-171): each pass re-feeds tanh of
    the previous pass's upsampled logits as the two extra seg channels.

    __call__(x, seg, inter_s8=None, inter_s4=None) -> dict of
    'pred_*' (sigmoid probs) / 'out_*' (logits) maps, NHWC single-channel.
    Passing inter_s8/inter_s4 skips the corresponding earlier passes exactly
    like the reference (used by the tiled local step, eval_helper.py:130).
    """

    dtype: Any = None

    def setup(self):
        self.feats = DilatedResNet50(dtype=self.dtype, name="feats")
        self.psp = PSPModule(1024, (1, 2, 3, 6), dtype=self.dtype, name="psp")
        self.up_1 = PSPUpsample(512, dtype=self.dtype, name="up_1")
        self.up_2 = PSPUpsample(256, dtype=self.dtype, name="up_2")
        self.up_3 = PSPUpsample(32, dtype=self.dtype, name="up_3")
        self.final_28_0 = TorchConv(32, 1, dtype=self.dtype, name="final_28_0")
        self.final_28_2 = TorchConv(1, 1, dtype=self.dtype, name="final_28_2")
        self.final_56_0 = TorchConv(32, 1, dtype=self.dtype, name="final_56_0")
        self.final_56_2 = TorchConv(1, 1, dtype=self.dtype, name="final_56_2")
        self.final_11 = TorchConv(32, 1, dtype=self.dtype, name="final_11")
        self.final_21 = TorchConv(1, 1, dtype=self.dtype, name="final_21")

    def _final_28(self, p):
        return self.final_28_2(nn.relu(self.final_28_0(p)))

    def _final_56(self, p):
        return self.final_56_2(nn.relu(self.final_56_0(p)))

    def _up8(self, y):
        return resize_bilinear(y, (y.shape[-3] * 8, y.shape[-2] * 8),
                               align_corners=False)

    def _up4(self, y):
        return resize_bilinear(y, (y.shape[-3] * 4, y.shape[-2] * 4),
                               align_corners=False)

    def __call__(self, x, seg, inter_s8=None, inter_s4=None, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
            seg = seg.astype(self.dtype)
        images: Dict[str, jnp.ndarray] = {}

        # Pass 1 (s8)
        if inter_s8 is None:
            p = jnp.concatenate([x, seg, seg, seg], axis=-1)
            f, f_1, f_2 = self.feats(p, train)
            p = self.psp(f)
            r_inter_s8 = self._up8(self._final_28(p))
            r_inter_tanh_s8 = jnp.tanh(r_inter_s8)
            images["pred_28"] = jax.nn.sigmoid(r_inter_s8.astype(jnp.float32))
            images["out_28"] = r_inter_s8.astype(jnp.float32)
        else:
            r_inter_tanh_s8 = inter_s8.astype(x.dtype)

        # Pass 2 (s8 + s4)
        if inter_s4 is None:
            p = jnp.concatenate([x, seg, r_inter_tanh_s8, r_inter_tanh_s8], axis=-1)
            f, f_1, f_2 = self.feats(p, train)
            p = self.psp(f)
            r_inter_s8_2 = self._up8(self._final_28(p))
            r_inter_tanh_s8_2 = jnp.tanh(r_inter_s8_2)
            p = self.up_1(p, f_2, train)
            r_inter_s4 = self._up4(self._final_56(p))
            r_inter_tanh_s4 = jnp.tanh(r_inter_s4)
            images["pred_28_2"] = jax.nn.sigmoid(r_inter_s8_2.astype(jnp.float32))
            images["out_28_2"] = r_inter_s8_2.astype(jnp.float32)
            images["pred_56"] = jax.nn.sigmoid(r_inter_s4.astype(jnp.float32))
            images["out_56"] = r_inter_s4.astype(jnp.float32)
        else:
            r_inter_tanh_s8_2 = inter_s8.astype(x.dtype)
            r_inter_tanh_s4 = inter_s4.astype(x.dtype)

        # Pass 3 (full res)
        p = jnp.concatenate([x, seg, r_inter_tanh_s8_2, r_inter_tanh_s4], axis=-1)
        f, f_1, f_2 = self.feats(p, train)
        p = self.psp(f)
        r_inter_s8_3 = self._up8(self._final_28(p))
        p = self.up_1(p, f_2, train)
        r_inter_s4_2 = self._up4(self._final_56(p))
        p = self.up_2(p, f_1, train)
        p = self.up_3(p, x, train)

        p = nn.relu(self.final_11(jnp.concatenate([p, x], axis=-1)))
        p = self.final_21(p).astype(jnp.float32)

        images["pred_224"] = jax.nn.sigmoid(p)
        images["out_224"] = p
        images["pred_28_3"] = jax.nn.sigmoid(r_inter_s8_3.astype(jnp.float32))
        images["pred_56_2"] = jax.nn.sigmoid(r_inter_s4_2.astype(jnp.float32))
        images["out_28_3"] = r_inter_s8_3.astype(jnp.float32)
        images["out_56_2"] = r_inter_s4_2.astype(jnp.float32)
        return images


# The SyncBN copy of the network (cascadePSP_model/psp/pspnet.py:66-172) is the
# same architecture — alias kept for reference-parity of the public surface.
PSPNet = RefinementModule
