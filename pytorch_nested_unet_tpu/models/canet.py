"""CA-Net: Comprehensive Attention U-Net (reference archs.py:29-959).

"CA-Net: Comprehensive Attention Convolutional Neural Networks for Explainable
Medical Image Segmentation". Encoder conv_block x5; decoder = UpCat
(deconv+concat) + SE_Conv_Block (dual avg/max channel SE) + grid-attention
MultiAttentionBlock on skips + NONLocalBlock2D at the bottleneck; deep
supervision via UnetDsv3 heads concatenated and fused by scale_atten_convblock
(CBAM-style scale attention); final 1x1 conv + Softmax2d.

Documented divergences from the reference (SURVEY.md §7 quirk policy):
  - out_size is a parameter (default (224, 300), the reference's hardcoded
    ISIC-2018 value, archs.py:853) and the SE blocks pool globally via
    adaptive pooling instead of hardcoding per-resolution window sizes
    (archs.py:614-628) — identical math at the reference resolution, and the
    model now works at any input size.
  - UpCat pads a width/height mismatch after deconv by *edge replication*
    instead of `torch.rand` garbage (archs.py:585-590).
  - conv_block/SE_Conv_Block dropout uses a fresh `nn.Dropout2d(0.5)(x)` in
    the reference's forward, which stays in training mode even under
    `model.eval()` (archs.py:43-44); here dropout is train-only.
  - Constructor follows this registry's uniform
    (num_classes, input_channels, deep_supervision) contract; the reference's
    `(args, in_ch, n_classes, ...)` signature cannot be built by its own
    trainer (train_Canet.py:236 calls it with zero args).
  - The final Softmax2d is kept: this model returns per-class *probabilities*
    (archs.py:900), unlike the logit-returning rest of the zoo.

TPU notes: the non-local block's (HW x HW) attention and the grid-attention
1x1 projections are MXU matmuls via einsum; everything else is conv/BN/elementwise
that XLA fuses. NHWC throughout.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layers import BatchNorm, TorchConv, TorchConvTranspose, TorchDense
from ..ops.pool import global_avg_pool, max_pool2x2
from ..ops.resize import resize_bilinear
from .attention_unet import ConvBlock


class GridAttentionBlock2D(nn.Module):
    """Gated grid attention (reference archs.py:101-253, mode 'concatenation').

    theta(x) + upsampled phi(g) -> relu/softplus -> psi -> sigmoid gate,
    upsampled to x's size, applied to x, then a 1x1 conv + BN output transform.
    """

    inter_channels: int
    mode: str = "concatenation"
    sub_sample_factor: Tuple[int, int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, g, train: bool = False):
        if self.mode not in ("concatenation", "concatenation_debug",
                             "concatenation_residual"):
            raise NotImplementedError(self.mode)
        in_channels = x.shape[-1]
        sf = self.sub_sample_factor

        theta_x = TorchConv(self.inter_channels, sf, stride=sf,
                            dtype=self.dtype, name="theta")(x)
        phi_g = TorchConv(self.inter_channels, 1, dtype=self.dtype, name="phi")(g)
        phi_g = resize_bilinear(phi_g, theta_x.shape[-3:-1], align_corners=False)

        if self.mode == "concatenation_debug":
            f = jax.nn.softplus(theta_x + phi_g)
        else:
            f = nn.relu(theta_x + phi_g)

        psi_f = TorchConv(1, 1, dtype=self.dtype, name="psi")(f)
        if self.mode == "concatenation_residual":
            b = psi_f.shape[0]
            flat = psi_f.reshape(b, -1).astype(jnp.float32)
            att = jax.nn.softmax(flat, axis=-1).reshape(psi_f.shape).astype(x.dtype)
        else:
            att = nn.sigmoid(psi_f)
        att = resize_bilinear(att, x.shape[-3:-1], align_corners=False)

        y = att * x
        w_y = TorchConv(in_channels, 1, dtype=self.dtype, name="W_conv")(y)
        w_y = BatchNorm(dtype=self.dtype, name="W_bn")(w_y, use_running_average=not train)
        return w_y, att


class MultiAttentionBlock(nn.Module):
    """Two parallel grid-attention gates combined by 1x1 conv+BN+ReLU
    (reference archs.py:263-285)."""

    inter_channels: int
    nonlocal_mode: str = "concatenation"
    sub_sample_factor: Tuple[int, int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, g, train: bool = False):
        in_channels = x.shape[-1]
        gate1, att1 = GridAttentionBlock2D(self.inter_channels, self.nonlocal_mode,
                                           self.sub_sample_factor, dtype=self.dtype,
                                           name="gate_block_1")(x, g, train)
        gate2, att2 = GridAttentionBlock2D(self.inter_channels, self.nonlocal_mode,
                                           self.sub_sample_factor, dtype=self.dtype,
                                           name="gate_block_2")(x, g, train)
        combined = TorchConv(in_channels, 1, dtype=self.dtype, name="combine_conv")(
            jnp.concatenate([gate1, gate2], axis=-1))
        combined = BatchNorm(dtype=self.dtype, name="combine_bn")(
            combined, use_running_average=not train)
        return nn.relu(combined), jnp.concatenate([att1, att2], axis=-1)


class NonLocalBlock2D(nn.Module):
    """Non-local block, embedded-gaussian / dot-product modes
    (reference archs.py:286-570; CA-Net uses embedded_gaussian at the
    bottleneck, archs.py:877). W's BN scale is zero-initialized so the block
    starts as identity (archs.py:329-330)."""

    inter_channels: int
    mode: str = "embedded_gaussian"
    sub_sample_factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.mode not in ("embedded_gaussian", "dot_product"):
            raise NotImplementedError(self.mode)
        b, h, w, c = x.shape
        ic = self.inter_channels

        g_x = TorchConv(ic, 1, dtype=self.dtype, name="g")(x)
        theta_x = TorchConv(ic, 1, dtype=self.dtype, name="theta")(x)
        phi_x = TorchConv(ic, 1, dtype=self.dtype, name="phi")(x)
        if self.sub_sample_factor > 1:
            g_x = max_pool2x2(g_x) if self.sub_sample_factor == 2 else g_x
            phi_x = max_pool2x2(phi_x) if self.sub_sample_factor == 2 else phi_x

        q = theta_x.reshape(b, h * w, ic)
        k = phi_x.reshape(b, -1, ic)
        v = g_x.reshape(b, -1, ic)
        f = jnp.einsum("bqc,bkc->bqk", q, k)
        if self.mode == "embedded_gaussian":
            attn = jax.nn.softmax(f.astype(jnp.float32), axis=-1).astype(v.dtype)
        else:
            attn = f / f.shape[-1]
        y = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, ic)

        w_y = TorchConv(c, 1, dtype=self.dtype, name="W_conv")(y)
        w_y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                           scale_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=jnp.float32, param_dtype=jnp.float32,
                           name="W_bn")(w_y.astype(jnp.float32)).astype(x.dtype)
        return w_y + x


class UpCat(nn.Module):
    """Deconv (or bilinear) 2x upsample + concat with skip, padding any
    spatial mismatch (reference archs.py:571-593; see module docstring for
    the torch.rand-padding divergence)."""

    out_feat: int
    is_deconv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, skip, down, train: bool = False):
        if self.is_deconv:
            up = TorchConvTranspose(self.out_feat, 2, stride=2, dtype=self.dtype,
                                    name="up")(down)
        else:
            up = resize_bilinear(down, (down.shape[-3] * 2, down.shape[-2] * 2),
                                 align_corners=False)
        dh = skip.shape[-3] - up.shape[-3]
        dw = skip.shape[-2] - up.shape[-2]
        if dh > 0 or dw > 0:
            up = jnp.pad(up, ((0, 0), (0, max(dh, 0)), (0, max(dw, 0)), (0, 0)),
                         mode="edge")
        return jnp.concatenate([skip, up], axis=-1)


class SEConvBlock(nn.Module):
    """Dual (avg+max pooled, shared-MLP) channel squeeze-excitation conv block
    (reference archs.py:598-712). Global pooling replaces the reference's
    hardcoded per-resolution window sizes."""

    planes: int
    drop_out: bool = False
    drop_rate: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        inplanes = x.shape[-1]

        out = TorchConv(p, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(p * 2, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)

        if inplanes != p:
            residual = TorchConv(p * 2, 1, use_bias=False, dtype=self.dtype,
                                 name="downchannel_conv")(x)
            residual = BatchNorm(dtype=self.dtype, name="downchannel_bn")(
                residual, use_running_average=not train)
        else:
            residual = x

        fc1 = TorchDense(round(p / 2), dtype=self.dtype, name="fc1")
        fc2 = TorchDense(p * 2, dtype=self.dtype, name="fc2")

        def gate(pooled):  # (B, 2p)
            return nn.sigmoid(fc2(nn.relu(fc1(pooled))))[:, None, None, :]

        avg_att = gate(global_avg_pool(out, keepdims=False))
        max_att = gate(jnp.max(out, axis=(-3, -2)))
        att_weight = avg_att + max_att

        out = avg_att * out + max_att * out + residual
        out = nn.relu(out)
        out = TorchConv(p, 3, padding=1, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=not train)
        out = nn.relu(out)
        if self.drop_out and self.drop_rate > 0 and train:
            # channel dropout (broadcast over H, W) = the reference's
            # nn.Dropout2d semantics (archs.py:684)
            out = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2),
                             deterministic=not train, name="dropout")(out)
        return out, att_weight


class UnetDsv3(nn.Module):
    """Deep-supervision head: 1x1 conv + bilinear upsample to out_size
    (reference archs.py:687-694)."""

    out_size: Tuple[int, int]
    out_channels: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.out_channels, 1, dtype=self.dtype, name="conv")(x)
        return resize_bilinear(x, self.out_size, align_corners=False)


class ChannelGate(nn.Module):
    """Scale-grouped channel gate: shared MLP on global avg+max pools, then
    per-scale-group (4 channels each) mean gate (reference archs.py:734-768)."""

    reduction_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = TorchDense(c // self.reduction_ratio, dtype=self.dtype, name="fc1")
        fc2 = TorchDense(c, dtype=self.dtype, name="fc2")

        def mlp(pooled):
            return fc2(nn.relu(fc1(pooled)))

        att = mlp(global_avg_pool(x, keepdims=False)) + mlp(jnp.max(x, axis=(-3, -2)))
        # group channels into 4 scales x 4 maps, gate each scale by its mean
        att = att.reshape(att.shape[0], 4, c // 4)
        avg_weight = jnp.mean(att, axis=2, keepdims=True)
        avg_weight = jnp.broadcast_to(avg_weight, att.shape).reshape(att.shape[0], c)
        scale = nn.sigmoid(avg_weight)[:, None, None, :]
        return x * scale, scale


class SpatialAtten(nn.Module):
    """Per-scale spatial gate broadcast over its 4-channel group
    (reference archs.py:713-733)."""

    out_size: int
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        pad = (self.kernel_size - 1) // 2
        y = TorchConv(self.out_size, self.kernel_size, padding=pad, use_bias=False,
                      dtype=self.dtype, name="conv1_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5,
                         dtype=jnp.float32, param_dtype=jnp.float32,
                         name="conv1_bn")(y.astype(jnp.float32)).astype(x.dtype)
        y = nn.relu(y)
        y = TorchConv(self.out_size, 1, use_bias=False, dtype=self.dtype,
                      name="conv2_conv")(y)
        y = nn.relu(y)
        att = nn.sigmoid(y)                                   # (B, H, W, 4)
        att = jnp.repeat(att, x.shape[-1] // att.shape[-1], axis=-1)
        return residual * att + residual, att


class ScaleAttenConvBlock(nn.Module):
    """CBAM-style scale attention + 3x3 fuse conv (reference archs.py:769-842)."""

    out_size: int
    reduction_ratio: int = 4
    no_spatial: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out, _ = ChannelGate(self.reduction_ratio, dtype=self.dtype,
                             name="channel_gate")(x)
        if not self.no_spatial:
            out, _ = SpatialAtten(x.shape[-1] // self.reduction_ratio,
                                  dtype=self.dtype, name="spatial_gate")(out, train)
        out = out + residual
        out = nn.relu(out)
        out = TorchConv(self.out_size, 3, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=not train)
        return nn.relu(out)


class Comprehensive_Atten_Unet(nn.Module):
    """CA-Net (reference archs.py:844-959). Returns per-class softmax
    probabilities at out_size resolution. Requires input H, W == out_size."""

    num_classes: int = 2
    input_channels: int = 3
    deep_supervision: bool = False  # registry uniformity; CA-Net's dsv is built-in
    feature_scale: int = 4
    is_deconv: bool = True
    nonlocal_mode: str = "concatenation"
    attention_dsample: Tuple[int, int] = (1, 1)
    out_size: Tuple[int, int] = (224, 300)
    drop_rate: float = 0.5  # 0 disables dropout (parity harness)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        filters = [int(f / self.feature_scale) for f in (64, 128, 256, 512, 1024)]
        dt = self.dtype

        conv1 = ConvBlock(filters[0], dtype=dt, name="conv1")(x, train)
        conv2 = ConvBlock(filters[1], dtype=dt, name="conv2")(max_pool2x2(conv1), train)
        conv3 = ConvBlock(filters[2], dtype=dt, name="conv3")(max_pool2x2(conv2), train)
        conv4 = ConvBlock(filters[3], drop_out=True, drop_rate=self.drop_rate,
                          dtype=dt, name="conv4")(max_pool2x2(conv3), train)
        center = ConvBlock(filters[4], drop_out=True, drop_rate=self.drop_rate,
                           dtype=dt, name="center")(max_pool2x2(conv4), train)

        up4 = UpCat(filters[3], self.is_deconv, dtype=dt, name="up_concat4")(
            conv4, center, train)
        g_conv4 = NonLocalBlock2D(filters[4] // 4, dtype=dt, name="nonlocal4_2")(
            up4, train)
        up4, att_weight4 = SEConvBlock(filters[3], drop_out=True,
                                       drop_rate=self.drop_rate, dtype=dt,
                                       name="up4")(g_conv4, train)

        g_conv3, att3 = MultiAttentionBlock(
            filters[2], self.nonlocal_mode, self.attention_dsample, dtype=dt,
            name="attentionblock3")(conv3, up4, train)
        up3 = UpCat(filters[2], self.is_deconv, dtype=dt, name="up_concat3")(
            g_conv3, up4, train)
        up3, att_weight3 = SEConvBlock(filters[2], dtype=dt, name="up3")(up3, train)

        g_conv2, att2 = MultiAttentionBlock(
            filters[1], self.nonlocal_mode, self.attention_dsample, dtype=dt,
            name="attentionblock2")(conv2, up3, train)
        up2 = UpCat(filters[1], self.is_deconv, dtype=dt, name="up_concat2")(
            g_conv2, up3, train)
        up2, att_weight2 = SEConvBlock(filters[1], dtype=dt, name="up2")(up2, train)

        up1 = UpCat(filters[0], self.is_deconv, dtype=dt, name="up_concat1")(
            conv1, up2, train)
        up1, att_weight1 = SEConvBlock(filters[0], dtype=dt, name="up1")(up1, train)

        out_size = (x.shape[-3], x.shape[-2])
        dsv4 = UnetDsv3(out_size, 4, dtype=dt, name="dsv4")(up4)
        dsv3 = UnetDsv3(out_size, 4, dtype=dt, name="dsv3")(up3)
        dsv2 = UnetDsv3(out_size, 4, dtype=dt, name="dsv2")(up2)
        dsv1 = TorchConv(4, 1, dtype=dt, name="dsv1")(up1)
        dsv_cat = jnp.concatenate([dsv1, dsv2, dsv3, dsv4], axis=-1)

        out = ScaleAttenConvBlock(4, dtype=dt, name="scale_att")(dsv_cat, train)
        out = TorchConv(self.num_classes, 1, dtype=dt, name="final")(out)
        if self.num_classes == 1:
            # The reference's Softmax2d (archs.py:900) over a single channel is
            # the constant 1.0 — untrainable with the binary-segmentation
            # trainers that default to num_classes=1 (train_Canet.py:56-57).
            # Intended behavior: return the raw logit for the binary case.
            return out.astype(jnp.float32)
        return jax.nn.softmax(out.astype(jnp.float32), axis=-1)
