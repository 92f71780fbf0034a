"""Device mesh construction and sharding for data (+ optional spatial) parallelism.

Data parallel: batch sharded over the 'data' axis, params/stats replicated.
BN batch statistics are global means over the sharded batch — XLA turns the
jnp.mean reductions inside flax BatchNorm into cross-replica all-reduces over
ICI automatically under GSPMD, which *is* SyncBN (replaces the reference's
vendored master/slave queue protocol, sync_batchnorm/comm.py:18-129).

Spatial parallel ('x'/'y' over H/W) is the CNN analogue of context parallelism
(SURVEY.md §2.5): XLA SPMD partitions convolutions spatially with automatic halo
exchange for the 3x3 stencils.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-D 'data' mesh over all devices. Pass axis_sizes for hybrid
    layouts, e.g. axis_sizes=(4, 2), axis_names=('data', 'x') for 4-way batch x
    2-way spatial partitioning.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    total = int(np.prod(axis_sizes))
    if total != len(devices):
        raise ValueError(f"mesh {tuple(axis_sizes)} needs {total} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (B, H, W, C) batches: B over 'data', optionally H/W over
    'x'/'y' if those axes exist in the mesh."""
    names = mesh.axis_names
    spec = [None, None, None, None]
    if "data" in names:
        spec[0] = "data"
    if spatial:
        if "x" in names:
            spec[1] = "x"
        if "y" in names:
            spec[2] = "y"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True,
                     spatial: bool = False):
    """Wrap an un-jitted step(state, images, masks, key) with pjit shardings:
    state replicated, batch sharded over 'data' (+spatial), outputs replicated."""
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh, spatial)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bat, bat, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
