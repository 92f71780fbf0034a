"""Pallas fused BN kernels (interpret mode on CPU) and the flax module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu.ops import fused_bn


@pytest.fixture(autouse=True)
def _pallas_interpret():
    fused_bn.enable_fused_bn(True, interpret=True)
    yield
    fused_bn.enable_fused_bn(False, interpret=False)


def _plain(x, gamma, beta, eps=1e-5):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean((x - mean) ** 2, axis=axes)
    return jnp.maximum((x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta, 0.0)


@pytest.mark.parametrize("c,shape", [
    (32, (4, 24, 24, 32)),   # packed f=4
    (64, (2, 16, 16, 64)),   # packed f=2
    (128, (2, 8, 8, 128)),   # unpacked
    (1, (2, 16, 16, 1)),     # score-map channel count, f=128
])
def test_fused_bn_relu_matches_plain(c, shape, rng):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    beta = jnp.asarray(rng.uniform(-0.3, 0.3, c), jnp.float32)

    for fn in (fused_bn.fused_bn_relu_train, fused_bn.stats_bn_relu_train):
        y, mean, var = fn(x, gamma, beta)
        np.testing.assert_allclose(np.asarray(y), np.asarray(_plain(x, gamma, beta)),
                                   atol=2e-5)
        axes = tuple(range(x.ndim - 1))
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(jnp.mean(x, axis=axes)), atol=1e-5)

        ct = jax.random.normal(jax.random.PRNGKey(0), x.shape)
        gf = jax.grad(lambda *a: jnp.sum(fn(*a)[0] * ct), argnums=(0, 1, 2))(
            x, gamma, beta)
        gp = jax.grad(lambda *a: jnp.sum(_plain(*a) * ct), argnums=(0, 1, 2))(
            x, gamma, beta)
        for a, b in zip(gf, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)


def test_module_running_stats_torch_semantics(rng):
    """EMA uses torch's unbiased running var and momentum 0.1."""
    import torch

    x = rng.standard_normal((4, 8, 8, 32)).astype(np.float32)
    m = fused_bn.FusedBatchNormReLU()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       use_running_average=False)
    y, mut = m.apply(variables, jnp.asarray(x), use_running_average=False,
                     mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(32)
    with torch.no_grad():
        out = torch.relu(tbn(torch.tensor(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(y),
                               out.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               tbn.running_var.numpy(), atol=1e-5)


def test_module_eval_uses_running_stats(rng):
    x = rng.standard_normal((2, 8, 8, 32)).astype(np.float32)
    m = fused_bn.FusedBatchNormReLU()
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       use_running_average=False)
    stats = {"mean": jnp.full((32,), 0.5), "var": jnp.full((32,), 2.0)}
    y = m.apply({"params": variables["params"], "batch_stats": stats},
                jnp.asarray(x), use_running_average=True)
    expect = np.maximum((x - 0.5) / np.sqrt(2.0 + 1e-5), 0.0)
    np.testing.assert_allclose(np.asarray(y), expect, atol=2e-5)
