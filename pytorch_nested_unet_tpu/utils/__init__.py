"""Utilities: config round-trip, meters, param counting (reference utils.py:4-33)."""

from .config import str2bool, save_config, load_config
from .meters import AverageMeter
from .plotting import plot_data, read_log
from .torch_convert import convert_reference_state_dict, export_reference_state_dict

import jax
import numpy as np


def count_params(params) -> int:
    """Total parameter count (reference utils.py count_params)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


__all__ = ["str2bool", "save_config", "load_config", "AverageMeter",
           "count_params", "plot_data", "read_log",
           "convert_reference_state_dict", "export_reference_state_dict"]
