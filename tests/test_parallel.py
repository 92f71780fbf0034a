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


def test_spatial_partition_matches_single_device(mesh):
    """2x4 data x spatial-H sharding must reproduce the single-device step —
    XLA's halo exchange for the 3x3 stencils is numerically transparent."""
    mesh2 = make_mesh(axis_sizes=(2, 4), axis_names=("data", "x"))
    model, tx, state, imgs, msks = _setup(batch=4)
    key = jax.random.PRNGKey(3)

    step1 = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False)
    s1, m1 = step1(state, jnp.asarray(imgs), jnp.asarray(msks), key)

    stepS = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False, mesh=mesh2, spatial=True)
    sS, mS = stepS(jax.device_put(state, replicated_sharding(mesh2)),
                   jnp.asarray(imgs), jnp.asarray(msks), key)

    assert float(m1["loss"]) == pytest.approx(float(mS["loss"]), rel=1e-4)
    # halo-exchange reduction order perturbs BN moments slightly; bounds cover
    # that FP noise while still catching any real partitioning defect
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sS.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)


def test_epoch_scan_matches_per_step_loop():
    """make_epoch_runner (one scanned dispatch) must reproduce the per-step
    loop exactly: same final params, same per-step metrics."""
    from pytorch_nested_unet_tpu.training.loop import make_epoch_runner

    model, tx, state, imgs, msks = _setup(batch=8)
    idx = np.stack([np.array([0, 1, 2, 3]), np.array([4, 5, 6, 7])])
    key = jax.random.PRNGKey(11)

    step = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                           donate=False)
    s_ref = state
    losses_ref = []
    k = key
    for row in idx:
        k, sub = jax.random.split(k)
        s_ref, m = step(s_ref, jnp.asarray(imgs[row]), jnp.asarray(msks[row]), sub)
        losses_ref.append(float(m["loss"]))

    run_epoch = make_epoch_runner(model, tx, "BCEDiceLoss", False, augment=False)
    s_scan, metrics = run_epoch(state, jnp.asarray(imgs), jnp.asarray(msks),
                                jnp.asarray(idx), key)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), losses_ref, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_ref.params), jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_wrapped_optimizer_state_shards_on_mesh(mesh):
    """The failure-detection + grad-accumulation wrapper states
    (ApplyIfFiniteState / MultiStepsState) replicate and update correctly
    under the pjit-sharded train step."""
    rng = np.random.default_rng(3)
    model = models.create_model("UNet", num_classes=1)
    imgs = rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8)
    msks = (rng.random((8, 16, 16, 1)) > 0.5).astype(np.uint8) * 255
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                           train=True)
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4, skip_nonfinite=2,
                         accum_steps=2)
    state = jax.device_put(TrainState.create(variables, tx),
                           replicated_sharding(mesh))
    step = make_train_step(model, tx, "BCEDiceLoss", False, mesh=mesh,
                           donate=False)
    bs = batch_sharding(mesh)
    for i in range(2):
        state, metrics = step(state, jax.device_put(jnp.asarray(imgs), bs),
                              jax.device_put(jnp.asarray(msks), bs),
                              jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    from pytorch_nested_unet_tpu.training.optim import (
        get_learning_rate, nonfinite_count,
    )
    assert nonfinite_count(state.opt_state) == 0  # healthy grads, none skipped
    assert get_learning_rate(state.opt_state) == pytest.approx(1e-3)


def test_tensor_parallel_step_matches_single_device(mesh):
    """2-way data x 4-way tensor (out-channel) parallelism must reproduce the
    single-device step: GSPMD's activation collectives around the sharded
    kernels are numerically transparent, and the optimizer-state leaves carry
    the same layout (the HBM lever for models too big for one chip)."""
    from pytorch_nested_unet_tpu.parallel import state_shardings

    meshT = make_mesh(axis_sizes=(2, 4), axis_names=("data", "model"))
    model, tx, state, imgs, msks = _setup()
    key = jax.random.PRNGKey(11)

    step1 = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False)
    s1, m1 = step1(state, jnp.asarray(imgs), jnp.asarray(msks), key)

    shardings = state_shardings(meshT, state)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(sp) for sp in specs), "no leaf got a TP spec"

    stepT = make_train_step(model, tx, "BCEDiceLoss", False, augment=False,
                            donate=False, mesh=meshT,
                            state_shardings=shardings)
    sT, mT = stepT(jax.device_put(state, shardings),
                   jnp.asarray(imgs), jnp.asarray(msks), key)

    # the big conv kernels (and their momentum) are genuinely partitioned:
    # each device holds out_channels/4
    sharded = [a for a in jax.tree.leaves(sT.params)
               if a.ndim == 4 and "model" in str(a.sharding.spec)]
    assert sharded, "no conv kernel partitioned over 'model'"
    a = sharded[0]
    assert a.addressable_shards[0].data.shape[-1] == a.shape[-1] // 4
    n_mom = sum(1 for a in jax.tree.leaves(sT.opt_state)
                if getattr(a, "ndim", 0) == 4
                and "model" in str(a.sharding.spec))
    assert n_mom >= len(sharded), "optimizer state not TP-sharded"

    assert float(m1["loss"]) == pytest.approx(float(mT["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sT.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(sT.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_tensor_parallel_spec_rules():
    """Shape rules: only large enough, evenly divisible kernel out-channels
    shard; biases/BN vectors/scalars replicate."""
    from jax.sharding import PartitionSpec as P

    from pytorch_nested_unet_tpu.parallel import tensor_parallel_spec

    conv = np.zeros((3, 3, 64, 128), np.float32)
    assert tensor_parallel_spec(conv, 4) == P(None, None, None, "model")
    dense = np.zeros((512, 256), np.float32)
    assert tensor_parallel_spec(dense, 4) == P(None, "model")
    assert tensor_parallel_spec(np.zeros((128,), np.float32), 4) == P()
    assert tensor_parallel_spec(np.zeros((3, 3, 64, 126), np.float32), 4) == P()  # 126 % 4
    assert tensor_parallel_spec(np.zeros((3, 3, 4, 4), np.float32), 4) == P()  # tiny
    assert tensor_parallel_spec(np.zeros((), np.float32), 4) == P()
