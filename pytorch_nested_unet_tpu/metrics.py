"""Segmentation metrics, computed on device.

The reference computes IoU via `.cpu().numpy()` *every step* (reference
metrics.py:10-12), a device→host sync in the hot loop. Here every metric is a
jittable jnp function returning a scalar that stays on device; the training loop
only syncs once per logging interval.

Formulas match the reference exactly:
  - iou_score: sigmoid -> threshold 0.5 on both -> (|and| + 1e-5)/(|or| + 1e-5)
    (reference metrics.py:6-18).
  - dice_coef: soft dice on sigmoid probs, no threshold (reference metrics.py:21-29).
  - pixel accuracy (`Acc`): fraction of pixels where thresholded prediction equals
    the binarized target (reference metrics.py:47-105, sans debug prints).
"""

import jax
import jax.numpy as jnp

__all__ = ["iou_score", "dice_coef", "pixel_accuracy", "numeric_score"]


def iou_score(logits, targets, smooth: float = 1e-5):
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
    tgt = targets.astype(jnp.float32) > 0.5
    intersection = jnp.sum(jnp.logical_and(pred, tgt))
    union = jnp.sum(jnp.logical_or(pred, tgt))
    return (intersection + smooth) / (union + smooth)


def iou_score_weighted(logits, targets, weights, smooth: float = 1e-5):
    """IoU over valid samples only (weights 0/1 per sample) — for padded val batches."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
    tgt = targets.astype(jnp.float32) > 0.5
    w = weights.astype(jnp.float32).reshape((-1,) + (1,) * (logits.ndim - 1))
    intersection = jnp.sum(jnp.logical_and(pred, tgt) * w)
    union = jnp.sum(jnp.logical_or(pred, tgt) * w)
    return (intersection + smooth) / (union + smooth)


def dice_coef(logits, targets, smooth: float = 1e-5):
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    tgt = targets.astype(jnp.float32).reshape(-1)
    intersection = jnp.sum(probs * tgt)
    return (2.0 * intersection + smooth) / (jnp.sum(probs) + jnp.sum(tgt) + smooth)


def numeric_score(pred_binary, target_binary):
    """FP, FN, TP, TN pixel counts (reference metrics.py:31-45)."""
    pred = pred_binary.astype(jnp.bool_)
    tgt = target_binary.astype(jnp.bool_)
    fp = jnp.sum(jnp.logical_and(pred, jnp.logical_not(tgt)))
    fn = jnp.sum(jnp.logical_and(jnp.logical_not(pred), tgt))
    tp = jnp.sum(jnp.logical_and(pred, tgt))
    tn = jnp.sum(jnp.logical_and(jnp.logical_not(pred), jnp.logical_not(tgt)))
    return fp, fn, tp, tn


def pixel_accuracy(logits, targets):
    """`Acc` (reference metrics.py:47-105): threshold probs at 0.5, compare."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5
    tgt = targets.astype(jnp.float32) > 0.5
    fp, fn, tp, tn = numeric_score(pred, tgt)
    total = fp + fn + tp + tn
    return (tp + tn) / jnp.maximum(total, 1)
