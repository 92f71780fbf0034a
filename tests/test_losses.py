"""Loss parity vs independent PyTorch/numpy implementations of the same formulas."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_nested_unet_tpu import losses


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal((4, 9, 9, 1), dtype=np.float32) * 3
    targets = (rng.random((4, 9, 9, 1)) > 0.5).astype(np.float32)
    ours = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(F.binary_cross_entropy_with_logits(torch.from_numpy(logits),
                                                   torch.from_numpy(targets)))
    assert abs(ours - ref) < 1e-5


def test_bce_dice_matches_reference_formula(rng):
    # reference losses.py:107-117: 0.5*bce + (1 - mean per-sample dice)
    logits = rng.standard_normal((4, 9, 9, 1), dtype=np.float32) * 2
    targets = (rng.random((4, 9, 9, 1)) > 0.4).astype(np.float32)
    ours = float(losses.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))

    t_in, t_tg = torch.from_numpy(logits), torch.from_numpy(targets)
    bce = F.binary_cross_entropy_with_logits(t_in, t_tg)
    smooth = 1e-5
    probs = torch.sigmoid(t_in).reshape(4, -1)
    tg = t_tg.reshape(4, -1)
    inter = (probs * tg).sum(1)
    dice = (2 * inter + smooth) / (probs.sum(1) + tg.sum(1) + smooth)
    ref = float(0.5 * bce + 1 - dice.mean())
    assert abs(ours - ref) < 1e-5


def _lovasz_numpy(logits, labels):
    """Independent numpy re-derivation of per-image binary Lovász hinge."""
    per_image = []
    for lg, lb in zip(logits.reshape(logits.shape[0], -1),
                      labels.reshape(labels.shape[0], -1)):
        signs = 2.0 * lb - 1.0
        errors = 1.0 - lg * signs
        order = np.argsort(-errors, kind="stable")
        e = errors[order]
        g = lb[order]
        gts = g.sum()
        inter = gts - np.cumsum(g)
        union = gts + np.cumsum(1 - g)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        per_image.append(np.maximum(e, 0) @ jac)
    return float(np.mean(per_image))


def test_lovasz_hinge_matches_numpy(rng):
    logits = (rng.standard_normal((3, 8, 8, 1)) * 4).astype(np.float32)
    targets = (rng.random((3, 8, 8, 1)) > 0.5).astype(np.float32)
    ours = float(losses.lovasz_hinge_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = _lovasz_numpy(logits, targets)
    assert abs(ours - ref) < 1e-5


def test_lovasz_all_background_and_all_foreground(rng):
    logits = (rng.standard_normal((2, 6, 6, 1)) * 2).astype(np.float32)
    for val in (0.0, 1.0):
        targets = np.full((2, 6, 6, 1), val, np.float32)
        ours = float(losses.lovasz_hinge_loss(jnp.asarray(logits), jnp.asarray(targets)))
        ref = _lovasz_numpy(logits, targets)
        assert abs(ours - ref) < 1e-5


def test_loss_registry():
    assert set(losses.LOSS_NAMES) == {"BCEDiceLoss", "LovaszHingeLoss", "BCEWithLogitsLoss"}
    for n in losses.LOSS_NAMES:
        assert callable(losses.get_loss(n))
    with pytest.raises(KeyError):
        losses.get_loss("nope")
