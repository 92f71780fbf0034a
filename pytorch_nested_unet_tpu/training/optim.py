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

import jax
import jax.numpy as jnp
import optax


def build_optimizer(optimizer: str = "SGD", lr: float = 1e-3, momentum: float = 0.9,
                    weight_decay: float = 1e-4, nesterov: bool = False,
                    skip_nonfinite: int = 0, accum_steps: int = 1):
    """Returns an optax transform whose opt_state exposes hyperparams['learning_rate'].

    skip_nonfinite > 0 adds on-device failure detection (optax.apply_if_finite):
    a step whose gradients contain NaN/inf is *skipped* — params, momentum and
    Adam moments stay untouched — and up to `skip_nonfinite` consecutive bad
    steps are tolerated before the non-finite update is allowed through (which
    the trainer's per-epoch finite-loss check then catches and aborts on).
    The reference has no failure handling at all (SURVEY.md §5): a NaN loss
    silently poisons the weights and the run continues.

    accum_steps > 1 accumulates gradients over K micro-batches
    (optax.MultiSteps): the parameter update applies every K-th step, giving a
    K-times-larger effective batch at constant per-step memory.
    """

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

    tx = optax.inject_hyperparams(make)(learning_rate=lr)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=int(skip_nonfinite))
    if accum_steps and accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_steps)
                              ).gradient_transformation()
    return tx


def _hyperparams_holder(opt_state):
    """Walk wrapper states (ApplyIfFiniteState.inner_state,
    MultiStepsState.inner_opt_state) down to the InjectHyperparamsState.
    Returns (path, holder) where path is the attribute chain from the root."""
    path, st = [], opt_state
    while not hasattr(st, "hyperparams"):
        for attr in ("inner_state", "inner_opt_state"):
            if hasattr(st, attr):
                path.append(attr)
                st = getattr(st, attr)
                break
        else:
            raise ValueError("optimizer state exposes no injected hyperparams")
    return path, st


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate (through any
    apply_if_finite / MultiSteps wrapper states)."""
    path, holder = _hyperparams_holder(opt_state)
    hp = dict(holder.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    new = holder._replace(hyperparams=hp)
    for i in range(len(path) - 1, -1, -1):
        outer = opt_state
        for attr in path[:i]:
            outer = getattr(outer, attr)
        new = outer._replace(**{path[i]: new})
    return new


def get_learning_rate(opt_state) -> float:
    return float(_hyperparams_holder(opt_state)[1].hyperparams["learning_rate"])


def nonfinite_count(opt_state):
    """Total non-finite (skipped) update count if failure detection is on
    (build_optimizer(skip_nonfinite>0)), else None."""
    st = opt_state
    while st is not None:
        if hasattr(st, "total_notfinite"):
            return int(st.total_notfinite)
        st = getattr(st, "inner_opt_state", getattr(st, "inner_state", None))
    return None


@jax.jit
def _tree_all_finite(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.stack(
        [jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in leaves]))


def params_all_finite(params) -> bool:
    """One fused on-device reduction over every param leaf.

    Guards the failure-detection path: optax.apply_if_finite *applies* the
    non-finite update once its consecutive-error tolerance is exhausted, which
    can poison params with a finite-looking epoch loss (the NaN step losses are
    excluded from the meters). Checking params directly before checkpointing is
    the airtight detector.
    """
    return bool(_tree_all_finite(params))


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
