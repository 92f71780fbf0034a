"""Mesh data-parallelism on the 8-virtual-device CPU backend.

Checks the GSPMD SyncBN claim: an 8-way batch-sharded train step must produce
the same new params/batch_stats as the single-device step (global BN moments),
which is what the reference's vendored SyncBN protocol provided
(reference sync_batchnorm/batchnorm.py:90-111).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from pytorch_nested_unet_tpu.training import TrainState, build_optimizer, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


def _setup(batch=8):
    rng = np.random.default_rng(0)
    model = models.create_model("UNet", num_classes=1)
    imgs = rng.integers(0, 255, (batch, 16, 16, 3), dtype=np.uint8)
    msks = (rng.random((batch, 16, 16, 1)) > 0.5).astype(np.uint8) * 255
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)), train=True)
    tx = build_optimizer("SGD", 1e-2, 0.9, 1e-4)
    state = TrainState.create(variables, tx)
    return model, tx, state, imgs, msks


def test_mesh_construction(mesh):
    assert mesh.shape == {"data": 8}
    with pytest.raises(ValueError):
        make_mesh(axis_sizes=(3,))


def test_sharded_step_matches_single_device(mesh):
    model, tx, state, imgs, msks = _setup()
    key = jax.random.PRNGKey(7)

    # single-device reference step (no augmentation for determinism across runs)
    step1 = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False)
    s1, m1 = step1(state, jnp.asarray(imgs), jnp.asarray(msks), key)

    # 8-way sharded step on the same initial state
    stepN = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False, mesh=mesh)
    imgs_sh = jax.device_put(jnp.asarray(imgs), batch_sharding(mesh))
    msks_sh = jax.device_put(jnp.asarray(msks), batch_sharding(mesh))
    state_rep = jax.device_put(state, replicated_sharding(mesh))
    sN, mN = stepN(state_rep, imgs_sh, msks_sh, key)

    assert float(m1["loss"]) == pytest.approx(float(mN["loss"]), rel=1e-4)
    # tolerances cover cross-device reduction-order FP noise through BN rsqrt
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)
    # BN running stats match => cross-replica moment sync happened
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(sN.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_spatial_partition_compiles(mesh):
    # 2-way data x 4-way spatial-H partitioning; XLA handles conv halo exchange.
    mesh2 = make_mesh(axis_sizes=(2, 4), axis_names=("data", "x"))
    model, tx, state, imgs, msks = _setup(batch=4)
    step = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                           donate=False, mesh=mesh2, spatial=True)
    s, m = step(jax.device_put(state, replicated_sharding(mesh2)),
                jnp.asarray(imgs), jnp.asarray(msks), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
