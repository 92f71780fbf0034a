"""Train state pytree."""

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx):
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
