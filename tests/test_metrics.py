"""Metric parity vs the reference formulas (reference metrics.py:6-29,47-105)."""

import jax.numpy as jnp
import numpy as np

from pytorch_nested_unet_tpu import metrics


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_iou_score(rng):
    logits = (rng.standard_normal((2, 8, 8, 1)) * 3).astype(np.float32)
    targets = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(metrics.iou_score(jnp.asarray(logits), jnp.asarray(targets)))
    p = _sigmoid(logits) > 0.5
    t = targets > 0.5
    ref = ((p & t).sum() + 1e-5) / ((p | t).sum() + 1e-5)
    assert abs(ours - ref) < 1e-6


def test_dice_coef(rng):
    logits = (rng.standard_normal((2, 8, 8, 1)) * 3).astype(np.float32)
    targets = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(metrics.dice_coef(jnp.asarray(logits), jnp.asarray(targets)))
    p = _sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    ref = (2 * (p * t).sum() + 1e-5) / (p.sum() + t.sum() + 1e-5)
    assert abs(ours - ref) < 1e-5


def test_pixel_accuracy(rng):
    logits = (rng.standard_normal((2, 8, 8, 1)) * 3).astype(np.float32)
    targets = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(metrics.pixel_accuracy(jnp.asarray(logits), jnp.asarray(targets)))
    p = _sigmoid(logits) > 0.5
    t = targets > 0.5
    ref = (p == t).mean()
    assert abs(ours - ref) < 1e-6


def test_metrics_all_empty():
    logits = np.full((1, 4, 4, 1), -10.0, np.float32)
    targets = np.zeros((1, 4, 4, 1), np.float32)
    iou = float(metrics.iou_score(jnp.asarray(logits), jnp.asarray(targets)))
    assert iou == 1.0  # smooth/smooth
