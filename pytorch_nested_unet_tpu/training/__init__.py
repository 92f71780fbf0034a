"""Training stack: optimizers/schedulers (torch-parity), train state, jitted
step builders, checkpointing."""

from .optim import build_optimizer, LRSchedule, set_learning_rate
from .state import TrainState
from .loop import make_train_step, make_eval_step
from . import checkpoint

__all__ = ["build_optimizer", "LRSchedule", "set_learning_rate", "TrainState",
           "make_train_step", "make_eval_step", "checkpoint"]
