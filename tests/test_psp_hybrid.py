"""PSP-hybrid models + val.py --refine path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu import models


@pytest.mark.parametrize("arch", [
    # the CAttention hybrid compiles ~2x longer on 1 CPU core; one hybrid
    # forward in the fast lane covers the PSP composition path, the other
    # runs with the slow lane
    pytest.param("UNetRNNCAttention_PSP", marks=pytest.mark.slow),
    "UNetRNNPSP",
])
def test_psp_hybrid_forward(arch):
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    m = models.create_model(arch, num_classes=1)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 1)
    p = np.asarray(out)
    assert (p >= 0).all() and (p <= 1).all()  # pred_224 probabilities


def test_psp_hybrid_param_composition():
    """~= UNetRNN(CAM) params + RefinementModule (67,683,433)."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    m = models.create_model("UNetRNNPSP", num_classes=1)
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    base = models.create_model("UNetRNN", num_classes=1)
    vb = base.init(jax.random.PRNGKey(0), x, train=True)
    nb = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vb["params"]))
    assert n == nb + 67_683_433


def test_psp_hybrid_rejects_multiclass():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    m = models.create_model("UNetRNNPSP", num_classes=2)
    with pytest.raises(ValueError, match="num_classes=1"):
        m.init(jax.random.PRNGKey(0), x, train=True)


@pytest.mark.slow  # grad through the 67M-param refiner: ~90 s on 1 CPU core
def test_psp_hybrid_differentiable():
    """Unlike the reference (numpy in forward, archs_backup.py:1844), the
    rebuilt hybrid back-propagates end to end."""
    from pytorch_nested_unet_tpu.losses import bce_dice_loss

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray((np.random.default_rng(1).random((1, 32, 32, 1)) > 0.5),
                    jnp.float32)
    m = models.create_model("UNetRNNPSP", num_classes=1)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        out, _ = m.apply({"params": params, "batch_stats": variables["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        # pred_224 is a probability map; use plain MSE-style objective here
        return jnp.mean((out - y) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)
