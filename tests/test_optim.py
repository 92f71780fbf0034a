"""Optimizer/scheduler parity vs torch (reference trains.py:226-248)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from pytorch_nested_unet_tpu.training.optim import (
    LRSchedule, build_optimizer, get_learning_rate, set_learning_rate,
)


def _run_parity(opt_name, steps=5, **kw):
    w0 = np.array([1.5, -2.0, 0.5], np.float32)
    grads = [np.array([0.1 * (i + 1), -0.2, 0.05 * i], np.float32) for i in range(steps)]

    # torch
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if opt_name == "SGD":
        topt = torch.optim.SGD([tw], lr=kw["lr"], momentum=kw["momentum"],
                               weight_decay=kw["weight_decay"], nesterov=kw["nesterov"])
    else:
        topt = torch.optim.Adam([tw], lr=kw["lr"], weight_decay=kw["weight_decay"])
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    # ours
    tx = build_optimizer(opt_name, kw["lr"], kw.get("momentum", 0.0),
                         kw["weight_decay"], kw.get("nesterov", False))
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_sgd_parity():
    _run_parity("SGD", lr=1e-2, momentum=0.9, weight_decay=1e-4, nesterov=False)


def test_sgd_nesterov_parity():
    _run_parity("SGD", lr=1e-2, momentum=0.9, weight_decay=1e-4, nesterov=True)


def test_adam_parity():
    _run_parity("Adam", lr=1e-3, weight_decay=1e-4)


def test_set_learning_rate():
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)
    opt_state = tx.init({"w": jnp.zeros(3)})
    assert get_learning_rate(opt_state) == pytest.approx(1e-3)
    opt_state = set_learning_rate(opt_state, 5e-4)
    assert get_learning_rate(opt_state) == pytest.approx(5e-4)


def test_cosine_schedule_matches_torch():
    epochs, base, min_lr = 10, 1e-3, 1e-5
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, T_max=epochs, eta_min=min_lr)
    ours = LRSchedule("CosineAnnealingLR", base, epochs, min_lr=min_lr)
    for e in range(epochs):
        assert ours.epoch_lr(e) == pytest.approx(topt.param_groups[0]["lr"], rel=1e-6)
        topt.step()
        tsched.step()


def test_multistep_schedule_matches_torch():
    base, milestones, gamma = 1e-3, [3, 6], 0.5
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.MultiStepLR(topt, milestones=milestones, gamma=gamma)
    ours = LRSchedule("MultiStepLR", base, 10, milestones=milestones, gamma=gamma)
    for e in range(10):
        assert ours.epoch_lr(e) == pytest.approx(topt.param_groups[0]["lr"], rel=1e-6)
        topt.step()
        tsched.step()


def test_plateau_reduces():
    s = LRSchedule("ReduceLROnPlateau", 1e-3, 100, min_lr=1e-5, factor=0.1, patience=2)
    losses = [1.0, 0.9, 0.9, 0.9, 0.9]  # improvement then 4 bad epochs
    for l in losses:
        s.plateau_step(l)
    assert s.epoch_lr(5) == pytest.approx(1e-4)


# ---- failure detection + gradient accumulation wrappers (SURVEY.md §5: the
# reference has no failure handling; these are the on-device guards) ----

def test_skip_nonfinite_skips_bad_step_and_counts():
    from pytorch_nested_unet_tpu.training.optim import nonfinite_count

    tx = build_optimizer("SGD", 0.1, momentum=0.9, weight_decay=0.0,
                         skip_nonfinite=2)
    params = {"w": jnp.ones(4)}
    st = tx.init(params)
    assert nonfinite_count(st) == 0

    bad = {"w": jnp.full(4, jnp.nan)}
    upd, st = tx.update(bad, st, params)
    params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0)  # update skipped
    assert nonfinite_count(st) == 1

    good = {"w": jnp.ones(4)}
    upd, st = tx.update(good, st, params)
    params = optax.apply_updates(params, upd)
    # momentum trace restarts from the preserved (finite) state: step = lr*g
    np.testing.assert_allclose(np.asarray(params["w"]), 0.9, rtol=1e-6)
    assert nonfinite_count(st) == 1


def test_accum_steps_applies_mean_every_k():
    tx = build_optimizer("SGD", 0.1, momentum=0.0, weight_decay=0.0,
                         accum_steps=2)
    params = {"w": jnp.zeros(3)}
    st = tx.init(params)
    upd, st = tx.update({"w": jnp.ones(3)}, st, params)
    params = optax.apply_updates(params, upd)
    np.testing.assert_allclose(np.asarray(params["w"]), 0.0)  # mini-step only
    upd, st = tx.update({"w": 3.0 * jnp.ones(3)}, st, params)
    params = optax.apply_updates(params, upd)
    # applied update = lr * mean(1, 3) = 0.1 * 2
    np.testing.assert_allclose(np.asarray(params["w"]), -0.2, rtol=1e-6)


def test_learning_rate_roundtrip_through_wrappers():
    tx = build_optimizer("Adam", 1e-3, weight_decay=1e-4,
                         skip_nonfinite=3, accum_steps=2)
    st = tx.init({"w": jnp.ones(2)})
    assert get_learning_rate(st) == pytest.approx(1e-3)
    st = set_learning_rate(st, 5e-4)
    assert get_learning_rate(st) == pytest.approx(5e-4)


def test_nonfinite_count_none_without_guard():
    from pytorch_nested_unet_tpu.training.optim import nonfinite_count

    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)
    st = tx.init({"w": jnp.zeros(2)})
    assert nonfinite_count(st) is None
