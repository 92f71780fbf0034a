"""Numerics of the Pallas fused upsample+concat+conv3x3 decoder op.

Runs the kernel in Pallas interpret mode on CPU against the XLA reference
(`reference_multipart_conv3x3`) — forward and all gradients — over the shape
variants the NestedUNet decoder produces (multi-part concat, single part,
H not a multiple of the row chunk, no bias).  See
pytorch_nested_unet_tpu/ops/decoder_fusion.py for the kernel design
(reference hot spot: archs_backup.py:123-141).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu.ops import decoder_fusion as df


@pytest.fixture(autouse=True)
def _enable_interpret():
    df.enable_decoder_fusion(True, interpret=True)
    yield
    df.enable_decoder_fusion(False)


def _mk(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _grads(fn, parts, k, bias):
    def loss(parts, k, bias):
        y = fn(parts, k, bias)
        return jnp.sum(jnp.sin(y * 0.3))

    return jax.grad(loss, argnums=(0, 1, 2))(parts, k, bias)


@pytest.mark.parametrize("cps,co,hw", [
    ((5, 3, 8), 6, (16, 16)),   # 3-part concat
    ((32, 64), 32, (12, 16)),   # decoder-like channels, H % CHUNK != 0
    ((7,), 4, (8, 8)),          # single part (no concat)
])
def test_fused_matches_reference(cps, co, hw):
    rng = np.random.default_rng(0)
    h, w = hw
    parts = tuple(_mk(rng, (2, h, w, c)) for c in cps)
    k = _mk(rng, (3, 3, sum(cps), co)) * 0.1
    bias = _mk(rng, (co,))
    assert df._supported(list(parts), k)

    ref = df.reference_multipart_conv3x3(parts, k, bias)
    out = df.fused_upcat_conv3x3(parts, k, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    gf = _grads(df.fused_upcat_conv3x3, parts, k, bias)
    gr = _grads(df.reference_multipart_conv3x3, parts, k, bias)
    for a, b in zip(gf[0], gr[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                               atol=1e-5, rtol=1e-5)


def test_no_bias_and_jit():
    rng = np.random.default_rng(1)
    parts = (_mk(rng, (1, 12, 16, 4)),)
    k = _mk(rng, (3, 3, 4, 3)) * 0.1
    ref = df.reference_multipart_conv3x3(parts, k)
    out = jax.jit(lambda p, k: df.fused_upcat_conv3x3(p, k))(parts, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_unsupported_falls_back():
    rng = np.random.default_rng(2)
    # W=10 not a multiple of 8 -> ineligible; must still produce XLA result.
    parts = (_mk(rng, (1, 8, 10, 4)),)
    k = _mk(rng, (3, 3, 4, 3)) * 0.1
    assert not df._supported(list(parts), k)
    out = df.fused_upcat_conv3x3(parts, k)
    ref = df.reference_multipart_conv3x3(parts, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_disabled_is_reference():
    df.enable_decoder_fusion(False)
    rng = np.random.default_rng(3)
    parts = (_mk(rng, (1, 8, 8, 4)),)
    k = _mk(rng, (3, 3, 4, 3)) * 0.1
    out = df.fused_upcat_conv3x3(parts, k)
    ref = df.reference_multipart_conv3x3(parts, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)
