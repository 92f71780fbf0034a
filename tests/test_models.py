"""Model zoo: construction, shapes, deep supervision, registry contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu import models

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


def _param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    if train:
        out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    else:
        out = model.apply(variables, x, train=False)
    return variables, out


def test_registry_contract():
    assert "UNet" in models.ARCH_NAMES and "NestedUNet" in models.ARCH_NAMES
    m = models.create_model("NestedUNet", num_classes=2, input_channels=3,
                            deep_supervision=True)
    assert m.num_classes == 2 and m.deep_supervision
    with pytest.raises(KeyError):
        models.create_model("NoSuchArch")


@pytest.mark.parametrize("arch", ["UNet", "NestedUNet"])
def test_forward_shapes(arch):
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    model = models.create_model(arch, num_classes=1)
    _, out = _init_and_apply(model, x)
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32


def test_deep_supervision_heads():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model = models.create_model("NestedUNet", deep_supervision=True)
    _, outs = _init_and_apply(model, x)
    assert isinstance(outs, list) and len(outs) == 4
    for o in outs:
        assert o.shape == (1, 32, 32, 1)


def test_param_counts_match_reference():
    # Parameter counts computed from the reference's PyTorch definitions
    # (archs_backup.py UNet:46-81, NestedUNet:84-152) with
    # num_classes=1, input_channels=3, nb_filter=[32,64,128,256,512].
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    expected = {
        "UNet": 7_852_545,
        ("NestedUNet", False): 9_163_329,
        ("NestedUNet", True): 9_163_428,
    }
    v, _ = _init_and_apply(models.create_model("UNet"), x)
    assert _param_count(v["params"]) == expected["UNet"]
    v, _ = _init_and_apply(models.create_model("NestedUNet"), x)
    assert _param_count(v["params"]) == expected[("NestedUNet", False)]
    v, _ = _init_and_apply(models.create_model("NestedUNet", deep_supervision=True), x)
    assert _param_count(v["params"]) == expected[("NestedUNet", True)]


def test_train_mode_updates_batch_stats():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    model = models.create_model("UNet")
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_dtype():
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    model = models.NestedUNet(num_classes=1, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    # params stored f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"]))
    out = model.apply(variables, x, train=False)
    assert out.dtype == jnp.float32  # logits returned f32


@pytest.mark.parametrize("mode", [True, "full", "policy"])
def test_nested_unet_remat_modes_match_baseline(mode):
    """remat=True/'full'/'policy' must change only the autodiff schedule,
    never the numerics: loss and grads equal the remat=False model."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 16, 16, 1)) > 0.5), jnp.float32)

    def loss_and_grads(remat):
        model = models.NestedUNet(num_classes=1, deep_supervision=True,
                                  nb_filter=(4, 8, 16, 32, 64), remat=remat)
        variables = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss_fn(params):
            outs, _ = model.apply({"params": params,
                                   "batch_stats": variables["batch_stats"]},
                                  x, train=True, mutable=["batch_stats"])
            return sum(jnp.mean((o - y) ** 2) for o in outs) / len(outs)

        return jax.value_and_grad(loss_fn)(variables["params"])

    base_loss, base_grads = loss_and_grads(False)
    loss, grads = loss_and_grads(mode)
    np.testing.assert_allclose(float(loss), float(base_loss), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(base_grads), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_nested_unet_remat_invalid_mode_raises():
    model = models.NestedUNet(num_classes=1, remat="bogus")
    with pytest.raises(ValueError, match="remat"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=True)
