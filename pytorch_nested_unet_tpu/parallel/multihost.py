"""Multi-host (multi-process) scale-out helpers.

The reference has no distributed story beyond single-node thread-based
DataParallel (SURVEY.md §2.5). The TPU-native story: each host runs this same
program, `jax.distributed.initialize` forms the global runtime, a global mesh
spans all chips, and GSPMD/pjit handles cross-host collectives over ICI/DCN —
the same train step used single-chip runs unchanged.

train.py calls `initialize_distributed()` at startup (a no-op single-process)
and gates file writes to process 0; everything else — the replicated
DeviceDataStore, the seeded batch schedule, the pjit train step — is already
SPMD-consistent across processes, so the cross-host collectives come out of
the same GSPMD machinery the 8-virtual-device mesh tests cover.
tests/test_multihost.py runs a REAL 2-process training job over CPU+Gloo
and checks it reproduces the single-process run.  `--pipeline host` is also
multi-host-consistent as-is: every process loads the identical seeded batch
stream, so the host-fed arrays are replicated inputs that GSPMD reshards onto
the global mesh (verified with a 2-process host-pipeline run).
"""

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Join the multi-host runtime (idempotent no-op when single-process).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or the TPU metadata when on Cloud TPU.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    try:  # CPU backends need Gloo for cross-process collectives; harmless else
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def global_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(per-host batch, this host's offset) for host-sharded input feeding.

    Each host loads only its shard of the global batch; `jax.make_array_from
    _process_local_data` / device_put with a global sharding assembles the
    global array without any host ever materializing the full batch.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n_proc} processes")
    per = global_batch // n_proc
    return per, per * jax.process_index()


def make_global_array(local_batch: np.ndarray, mesh, spec):
    """Assemble a globally-sharded jax.Array from this host's local shard."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    global_shape = (local_batch.shape[0] * jax.process_count(),) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_batch, global_shape)
