"""Optimizers and LR schedules with torch-parity semantics.

The reference supports Adam | SGD(+momentum, +nesterov, +weight_decay) and
CosineAnnealingLR | ReduceLROnPlateau | MultiStepLR | ConstantLR schedulers
stepped once per epoch (reference trains.py:226-248, 323-326).

torch coupling quirks we match:
  - weight decay is L2-added to the gradient *before* the momentum/Adam moments
    (torch SGD/Adam), i.e. optax.add_decayed_weights first in the chain — not
    decoupled AdamW.
  - ReduceLROnPlateau monitors val_loss (mode 'min'), factor/patience/min_lr
    (reference trains.py:244-246, stepped with val loss at :323-326).

The learning rate is exposed through optax.inject_hyperparams so the host-side
schedule can set it between epochs without re-jitting the train step.
"""

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def build_optimizer(optimizer: str = "SGD", lr: float = 1e-3, momentum: float = 0.9,
                    weight_decay: float = 1e-4, nesterov: bool = False):
    """Returns an optax transform whose opt_state exposes hyperparams['learning_rate']."""

    if optimizer == "Adam":
        def make(learning_rate):
            chain = []
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            chain.append(optax.scale(-1.0))
            chain.append(optax.scale(learning_rate))
            return optax.chain(*chain)
    elif optimizer == "SGD":
        def make(learning_rate):
            chain = []
            if weight_decay:
                chain.append(optax.add_decayed_weights(weight_decay))
            if momentum:
                chain.append(optax.trace(decay=momentum, nesterov=nesterov))
            chain.append(optax.scale(-1.0))
            chain.append(optax.scale(learning_rate))
            return optax.chain(*chain)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r} (Adam|SGD)")

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class LRSchedule:
    """Host-side per-epoch LR controller covering the reference's four schedulers.

    Call `lr = sched.epoch_lr(epoch)` before the epoch; for ReduceLROnPlateau
    call `sched.plateau_step(val_loss)` after validation.
    """

    def __init__(self, scheduler: str, base_lr: float, epochs: int,
                 min_lr: float = 1e-5, factor: float = 0.1, patience: int = 2,
                 milestones: Optional[Sequence[int]] = None, gamma: float = 2 / 3):
        if scheduler not in ("CosineAnnealingLR", "ReduceLROnPlateau",
                             "MultiStepLR", "ConstantLR"):
            raise ValueError(f"unknown scheduler {scheduler!r}")
        self.kind = scheduler
        self.base_lr = base_lr
        self.epochs = epochs
        self.min_lr = min_lr
        self.factor = factor
        self.patience = patience
        self.milestones = sorted(milestones or [1, 2])
        self.gamma = gamma
        # plateau state
        self._lr = base_lr
        self._best = math.inf
        self._bad_epochs = 0

    def epoch_lr(self, epoch: int) -> float:
        if self.kind == "CosineAnnealingLR":
            # torch: eta_min + (base - eta_min) * (1 + cos(pi * e / T_max)) / 2
            return self.min_lr + (self.base_lr - self.min_lr) * (
                1 + math.cos(math.pi * epoch / self.epochs)) / 2
        if self.kind == "MultiStepLR":
            k = sum(1 for m in self.milestones if epoch >= m)
            return self.base_lr * (self.gamma ** k)
        if self.kind == "ReduceLROnPlateau":
            return self._lr
        return self.base_lr  # ConstantLR

    def plateau_step(self, val_loss: float):
        """torch ReduceLROnPlateau (mode=min, threshold 1e-4 rel)."""
        if self.kind != "ReduceLROnPlateau":
            return
        if val_loss < self._best * (1 - 1e-4):
            self._best = val_loss
            self._bad_epochs = 0
        else:
            self._bad_epochs += 1
            if self._bad_epochs > self.patience:
                self._lr = max(self._lr * self.factor, self.min_lr)
                self._bad_epochs = 0
