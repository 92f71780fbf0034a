"""Parallelism: device meshes and sharding rules.

The reference's entire distributed story is a vendored thread-queue SyncBN for
single-node DataParallel (SURVEY.md §2.5). The TPU-native replacement is GSPMD:
shard the batch axis over a mesh, jit the train step with sharding constraints,
and XLA inserts the ICI collectives — including the BN moment all-reduce that
SyncBN hand-rolled (reference sync_batchnorm/batchnorm.py:90-111).
"""

from .mesh import (
    batch_sharding, make_mesh, parse_mesh_spec, replicated_sharding,
    shard_train_step, state_shardings, tensor_parallel_spec,
)
from .multihost import (
    global_batch_slice, initialize_distributed, make_global_array,
)

__all__ = ["make_mesh", "batch_sharding", "parse_mesh_spec",
           "replicated_sharding", "shard_train_step", "state_shardings",
           "tensor_parallel_spec",
           "initialize_distributed", "global_batch_slice", "make_global_array"]
