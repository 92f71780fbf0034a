"""Align-corners bilinear resize parity vs torch F.interpolate (SURVEY.md §7)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_nested_unet_tpu.ops import resize_bilinear, resize_nearest, upsample2x


def _torch_resize(x_nhwc, out_hw, mode, align_corners=None):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if align_corners is None else {"align_corners": align_corners}
    y = F.interpolate(t, size=out_hw, mode=mode, **kwargs)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((6, 6), (12, 12)),     # 2x upsample (decoder hot path)
    ((12, 10), (6, 5)),     # downsample
    ((7, 9), (13, 4)),      # odd sizes both directions
    ((1, 5), (3, 11)),      # degenerate 1-row input
    ((5, 5), (1, 1)),       # collapse to 1x1
])
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    ref = _torch_resize(x, out_hw, "bilinear", align)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_upsample2x_matches_torch_upsample(rng):
    # nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True),
    # reference archs_backup.py:93.
    x = rng.standard_normal((2, 6, 6, 4), dtype=np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x)))
    ref = _torch_resize(x, (12, 12), "bilinear", True)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((6, 6), (12, 12)), ((9, 7), (4, 5))])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 2), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = _torch_resize(x, out_hw, "nearest")
    np.testing.assert_allclose(ours, ref, atol=0, rtol=0)
