"""Jitted train/eval step builders.

One fused XLA program per step: gather batch from the device-resident dataset,
augment, normalize, forward, loss, backward, optimizer update, metrics — the
host never touches tensor data inside an epoch (contrast: the reference syncs
device→host every step for iou_score, reference metrics.py:10-12, trains.py:114-135).

Deep supervision averages the loss over the 4 heads and computes IoU on the last
head (reference trains.py:118-124). Donated state buffers keep HBM flat.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..data.augment import _augment_one, eval_transform, parse_augment_spec
from ..losses import get_loss, get_weighted_loss
from ..metrics import iou_score, iou_score_weighted, pixel_accuracy
from .state import TrainState


def _forward(model, params, batch_stats, images, train: bool, dropout_rng=None):
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        outs, mut = model.apply(variables, images, train=True,
                                mutable=["batch_stats"], rngs=rngs)
        return outs, mut["batch_stats"]
    return model.apply(variables, images, train=False), batch_stats


def _as_heads(outputs):
    return outputs if isinstance(outputs, (list, tuple)) else [outputs]


def make_train_step(model, tx, loss_name: str, deep_supervision: bool,
                    augment=True, donate: bool = True, mesh=None,
                    spatial: bool = False, state_shardings=None):
    """Returns step(state, images_u8, masks_u8, key) -> (state, metrics).

    images_u8/masks_u8 are raw uint8 batches (already gathered/sliced); the
    augmentation+normalization runs inside this jitted program. `augment` is
    a bool, an augment-spec string ('full'/'none'/comma list), or a static op
    tuple — see data.augment.parse_augment_spec. With `mesh`, the step is
    pjit-sharded: state replicated (or laid out per `state_shardings`, e.g.
    tensor-parallel from parallel.mesh.state_shardings), batch over the 'data'
    axis (+ H/W over 'x'/'y' if spatial) — see parallel.mesh.
    """
    loss_fn = get_loss(loss_name)
    augment = parse_augment_spec(augment)

    def step(state: TrainState, images_u8, masks_u8, key):
        key, dropout_key = jax.random.split(key)
        keys = jax.random.split(key, images_u8.shape[0])
        images, masks = jax.vmap(_augment_one, in_axes=(0, 0, 0, None))(
            keys, images_u8, masks_u8, augment)

        def compute_loss(params):
            outputs, new_stats = _forward(model, params, state.batch_stats, images,
                                          True, dropout_rng=dropout_key)
            heads = _as_heads(outputs)
            loss = sum(loss_fn(o, masks) for o in heads) / len(heads)
            return loss, (new_stats, heads[-1])

        (loss, (new_stats, final_out)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "iou": iou_score(final_out, masks),
                   "acc": pixel_accuracy(final_out, masks)}
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state, step=state.step + 1)
        return new_state, metrics

    if mesh is not None:
        from ..parallel.mesh import shard_train_step

        return shard_train_step(step, mesh, donate_state=donate, spatial=spatial,
                                state_shardings=state_shardings)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_name: str, deep_supervision: bool):
    """Returns eval_step(params, batch_stats, images_u8, masks_u8, weights) -> metrics.

    weights is a (B,) 0/1 vector marking valid (non-padding) samples so the
    final short batch of a drop_last=False loader is scored exactly like the
    reference's batch-size-weighted AverageMeter.
    """
    wloss_fn = get_weighted_loss(loss_name)

    @jax.jit
    def eval_step(params, batch_stats, images_u8, masks_u8, weights):
        images, masks = eval_transform(images_u8, masks_u8)
        outputs, _ = _forward(model, params, batch_stats, images, False)
        heads = _as_heads(outputs)
        loss = sum(wloss_fn(o, masks, weights) for o in heads) / len(heads)
        return {"loss": loss,
                "iou": iou_score_weighted(heads[-1], masks, weights),
                "acc": pixel_accuracy(heads[-1], masks)}

    return eval_step


def make_predict_fn(model, deep_supervision: bool):
    """Returns predict(params, batch_stats, images_u8) -> sigmoid probabilities
    of the final head (val.py semantics, reference val.py:92-100)."""

    @jax.jit
    def predict(params, batch_stats, images_u8):
        images, _ = eval_transform(images_u8, jnp.zeros_like(images_u8))
        outputs, _ = _forward(model, params, batch_stats, images, False)
        heads = _as_heads(outputs)
        return jax.nn.sigmoid(heads[-1])

    return predict


def make_epoch_runner(model, tx, loss_name: str, deep_supervision: bool,
                      augment=True):
    """Whole-epoch driver: run ALL train steps of an epoch inside one jitted
    lax.scan over a precomputed index permutation.

    TPU-first rationale: with the dataset device-resident (DeviceDataStore),
    a per-step Python loop pays one host->device dispatch per step — which
    dominates wall-clock on remote-attached TPUs and still costs ~50-100us
    locally. Scanning on device makes an epoch a single dispatch; per-step
    metrics come back as stacked scan outputs for the host-side AverageMeter.

    Returns run_epoch(state, images_u8, masks_u8, batch_idx, key) ->
    (state, metrics_per_step) where batch_idx is (steps, batch) int32 and each
    metrics_per_step leaf has leading dim `steps`.
    """
    step = make_train_step(model, tx, loss_name, deep_supervision,
                           augment=augment, donate=False)

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state, images_u8, masks_u8, batch_idx, key):
        def body(carry, idx):
            st, k = carry
            k, sub = jax.random.split(k)
            imgs = jnp.take(images_u8, idx, axis=0)
            msks = jnp.take(masks_u8, idx, axis=0)
            st, metrics = step(st, imgs, msks, sub)
            return (st, k), metrics

        (state, _), metrics = jax.lax.scan(body, (state, key), batch_idx)
        return state, metrics

    return run_epoch


def make_epoch_evaluator(model, loss_name: str, deep_supervision: bool):
    """Whole-epoch eval driver (single dispatch), weighted for padded batches.

    Returns eval_epoch(params, batch_stats, images_u8, masks_u8, batch_idx,
    weights) -> metrics_per_step (leading dim = steps). weights is
    (steps, batch) 0/1 marking valid samples.
    """
    eval_step = make_eval_step(model, loss_name, deep_supervision)

    @jax.jit
    def eval_epoch(params, batch_stats, images_u8, masks_u8, batch_idx, weights):
        def body(_, inp):
            idx, w = inp
            imgs = jnp.take(images_u8, idx, axis=0)
            msks = jnp.take(masks_u8, idx, axis=0)
            return None, eval_step(params, batch_stats, imgs, msks, w)

        _, metrics = jax.lax.scan(body, None, (batch_idx, weights))
        return metrics

    return eval_epoch
