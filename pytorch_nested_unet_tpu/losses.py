"""Segmentation losses, computed on device (no host sync).

Semantics match the reference exactly:
  - BCEDiceLoss: 0.5*BCEWithLogits + (1 - mean per-sample soft Dice), smooth 1e-5
    (reference losses.py:103-117).
  - LovaszHingeLoss: per-image binary Lovász hinge (reference losses.py:49-96,
    vendored from bermanmaxim/LovaszSoftmax). The data-dependent sort maps to
    jnp.sort/argsort under vmap (SURVEY.md §7 step 5).
  - BCEWithLogitsLoss: torch built-in equivalent (appended to the registry at
    reference trains.py:28).

All losses take (logits, targets) with logits shaped (B, H, W, C) NHWC (or any
(B, ...) layout — they only rely on the leading batch axis) and return a scalar.
"""

import jax
import jax.numpy as jnp

__all__ = ["BCEDiceLoss", "LovaszHingeLoss", "BCEWithLogitsLoss", "LOSS_NAMES",
           "get_loss", "bce_with_logits", "bce_dice_loss", "lovasz_hinge"]


def bce_with_logits(logits, targets):
    """Numerically-stable mean binary cross-entropy with logits."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*t + log(1 + exp(-|x|))
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def bce_dice_loss(logits, targets, smooth: float = 1e-5):
    """Reference losses.py:107-117."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    bce = bce_with_logits(logits, targets)
    num = logits.shape[0]
    probs = jax.nn.sigmoid(logits).reshape(num, -1)
    tgt = targets.reshape(num, -1)
    intersection = jnp.sum(probs * tgt, axis=1)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs, axis=1) + jnp.sum(tgt, axis=1) + smooth)
    return 0.5 * bce + (1.0 - jnp.mean(dice))


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t sorted errors (reference losses.py:49-61)."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)


def _lovasz_hinge_flat(logits, labels):
    """Reference losses.py:79-96: sort errors desc, dot(relu(errors), lovasz_grad)."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)          # descending, stable
    errors_sorted = errors[order]
    gt_sorted = labels[order]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_hinge(logits, labels, per_image: bool = True):
    """Binary Lovász hinge on (B, ...) logits/labels (reference losses.py:63-76)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    b = logits.shape[0]
    flat_logits = logits.reshape(b, -1)
    flat_labels = labels.reshape(b, -1)
    if per_image:
        return jnp.mean(jax.vmap(_lovasz_hinge_flat)(flat_logits, flat_labels))
    return _lovasz_hinge_flat(flat_logits.reshape(-1), flat_labels.reshape(-1))


def lovasz_hinge_loss(logits, targets):
    """Reference losses.py:120-129: squeeze the channel axis, per-image hinge."""
    # NHWC: drop the trailing channel (reference squeezes NCHW channel 1).
    if logits.ndim == 4 and logits.shape[-1] == 1:
        logits = logits[..., 0]
        targets = targets[..., 0]
    return lovasz_hinge(logits, targets, per_image=True)


def _weighted_mean(per_sample, weights):
    weights = weights.astype(jnp.float32)
    return jnp.sum(per_sample * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def bce_with_logits_weighted(logits, targets, weights):
    """BCE where sample i contributes weight w_i (w=1 reproduces the unweighted
    mean). Used for the final short validation batch (drop_last=False, padded)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_sample = jnp.mean(per.reshape(per.shape[0], -1), axis=1)
    return _weighted_mean(per_sample, weights)


def bce_dice_loss_weighted(logits, targets, weights, smooth: float = 1e-5):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    bce = bce_with_logits_weighted(logits, targets, weights)
    num = logits.shape[0]
    probs = jax.nn.sigmoid(logits).reshape(num, -1)
    tgt = targets.reshape(num, -1)
    intersection = jnp.sum(probs * tgt, axis=1)
    dice = (2.0 * intersection + smooth) / (jnp.sum(probs, axis=1) + jnp.sum(tgt, axis=1) + smooth)
    return 0.5 * bce + (1.0 - _weighted_mean(dice, weights))


def lovasz_hinge_loss_weighted(logits, targets, weights):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    b = logits.shape[0]
    per_image = jax.vmap(_lovasz_hinge_flat)(logits.reshape(b, -1), targets.reshape(b, -1))
    return _weighted_mean(per_image, weights)


def get_weighted_loss(name: str):
    return {
        "BCEDiceLoss": bce_dice_loss_weighted,
        "LovaszHingeLoss": lovasz_hinge_loss_weighted,
        "BCEWithLogitsLoss": bce_with_logits_weighted,
    }[name]


# Registry mirroring `losses.__all__` + manual BCEWithLogits append
# (reference trains.py:26-28).
BCEDiceLoss = bce_dice_loss
LovaszHingeLoss = lovasz_hinge_loss
BCEWithLogitsLoss = bce_with_logits

_LOSSES = {
    "BCEDiceLoss": bce_dice_loss,
    "LovaszHingeLoss": lovasz_hinge_loss,
    "BCEWithLogitsLoss": bce_with_logits,
}
LOSS_NAMES = sorted(_LOSSES)


def get_loss(name: str):
    try:
        return _LOSSES[name]
    except KeyError:
        raise KeyError(f"unknown loss {name!r}; available: {LOSS_NAMES}") from None
