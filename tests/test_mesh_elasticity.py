"""Checkpoint mesh elasticity (pod-resize story): a checkpoint saved under one
mesh layout must restore under ANOTHER layout and continue training as if the
resize never happened.

Covered both directions on 8 virtual CPU devices:
  {data:2, x:2, model:2}  ->  {data:8}   (shrink to pure DP)
  {data:8}                ->  {data:2, x:2, model:2}   (grow into dp+sp+tp)

Claims, strongest first:
  1. the restored host state is BITWISE-identical to the saved state
     (save_training_state gathers shards to full host arrays, so a layout
     change is just a device_put with the new shardings);
  2. the next train step from the restored state is BITWISE-equal to the
     next step from the directly-resharded (no-checkpoint) state — same
     program, same inputs, so exact equality is well-defined;
  3. the next-step loss across the two mesh layouts agrees to float-32
     tolerance (different collective reduction orders make cross-PROGRAM
     bitwise equality not a meaningful contract).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.parallel import (
    batch_sharding, make_mesh, replicated_sharding, state_shardings,
)
from pytorch_nested_unet_tpu.training import (
    TrainState, build_optimizer, checkpoint, make_train_step,
)

pytestmark = [
    pytest.mark.slow,  # multi-minute: see pyproject fast lane
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]


def _setup():
    model = models.create_model("NestedUNet", num_classes=1,
                                deep_supervision=True)
    rng = np.random.default_rng(0)
    batch = 8
    imgs = jnp.asarray(rng.integers(0, 255, (batch, 32, 32, 3), dtype=np.uint8))
    msks = jnp.asarray((rng.random((batch, 32, 32, 1)) > 0.5)
                       .astype(np.uint8) * 255)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    tx = build_optimizer("SGD", 0.05, 0.9, 1e-4)
    return model, tx, variables, imgs, msks


def _mesh_env(model, tx, variables, mesh, spatial):
    """(initial sharded state, train step fn, shardings, batch sharding)."""
    tp = "model" in mesh.axis_names
    st = state_shardings(mesh, TrainState.create(variables, tx)) if tp \
        else replicated_sharding(mesh)
    state = jax.device_put(TrainState.create(variables, tx), st)
    step = make_train_step(model, tx, "BCEDiceLoss", True, mesh=mesh,
                           spatial=spatial, donate=False,
                           state_shardings=st if tp else None)
    return state, step, st, batch_sharding(mesh, spatial)


def _assert_tree_bitwise(a, b, what):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=what)


def _run_direction(tmp_path, mesh_a, spatial_a, mesh_b, spatial_b):
    model, tx, variables, imgs, msks = _setup()
    state_a, step_a, _, bs_a = _mesh_env(model, tx, variables, mesh_a, spatial_a)
    imgs_a, msks_a = jax.device_put(imgs, bs_a), jax.device_put(msks, bs_a)

    # two steps under mesh A, then checkpoint
    key = jax.random.PRNGKey(1)
    for s in range(2):
        key, sub = jax.random.split(key)
        state_a, m = step_a(state_a, imgs_a, msks_a, sub)
    loss_a_next_key = jax.random.PRNGKey(7)
    checkpoint.save_training_state(str(tmp_path), state_a, epoch=2,
                                   best_iou=0.5, trigger=1)

    # restore under mesh B
    fresh_b, step_b, st_b, bs_b = _mesh_env(model, tx, variables, mesh_b,
                                            spatial_b)
    restored, epoch, best_iou, trigger = checkpoint.load_training_state(
        str(tmp_path), fresh_b)
    assert (epoch, best_iou, trigger) == (2, 0.5, 1)

    # claim 1: restored host state is bitwise the saved state
    host_a = jax.device_get((state_a.params, state_a.batch_stats))
    host_r = jax.device_get((restored.params, restored.batch_stats))
    _assert_tree_bitwise(host_a, host_r, "restored state != saved state")

    restored = jax.device_put(restored, st_b)
    imgs_b, msks_b = jax.device_put(imgs, bs_b), jax.device_put(msks, bs_b)

    # claim 2: next step from the checkpoint == next step from a direct
    # reshard (same program, same inputs -> bitwise)
    direct = jax.device_put(jax.device_get(state_a), st_b)
    s_ckpt, m_ckpt = step_b(restored, imgs_b, msks_b, loss_a_next_key)
    s_dir, m_dir = step_b(direct, imgs_b, msks_b, loss_a_next_key)
    assert float(m_ckpt["loss"]) == float(m_dir["loss"])
    _assert_tree_bitwise(jax.device_get(s_ckpt.params),
                         jax.device_get(s_dir.params),
                         "post-step params diverge: ckpt vs direct reshard")

    # claim 3: the same next step under mesh A agrees to f32 tolerance
    _, m_a = step_a(state_a, imgs_a, msks_a, loss_a_next_key)
    np.testing.assert_allclose(float(m_ckpt["loss"]), float(m_a["loss"]),
                               rtol=1e-5, atol=1e-6)
    return float(m_ckpt["loss"]), float(m_a["loss"])


def test_shrink_tp_mesh_to_pure_dp(tmp_path):
    mesh_a = make_mesh(axis_sizes=(2, 2, 2), axis_names=("data", "x", "model"))
    mesh_b = make_mesh(axis_sizes=(8,), axis_names=("data",))
    _run_direction(tmp_path, mesh_a, True, mesh_b, False)


def test_grow_pure_dp_to_tp_mesh(tmp_path):
    mesh_a = make_mesh(axis_sizes=(8,), axis_names=("data",))
    mesh_b = make_mesh(axis_sizes=(2, 2, 2), axis_names=("data", "x", "model"))
    _run_direction(tmp_path, mesh_a, False, mesh_b, True)
