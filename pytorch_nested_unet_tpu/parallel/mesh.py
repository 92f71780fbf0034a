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


def parse_mesh_spec(spec: str) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
    """Parse a CLI mesh spec like ``"data=4,x=2"`` into (names, sizes).

    Axis names are free-form but 'data' shards the batch dim and 'x'/'y' shard
    H/W (see batch_sharding). Sizes must be positive integers.
    """
    names, sizes = [], []
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad mesh axis {part!r} (want name=size, e.g. 'data=4,x=2')")
        name, _, size = part.partition("=")
        name = name.strip()
        try:
            size = int(size)
        except ValueError:
            raise ValueError(f"bad mesh axis size in {part!r}") from None
        if size < 1:
            raise ValueError(f"mesh axis {name!r} must have size >= 1, got {size}")
        if name in names:
            raise ValueError(f"duplicate mesh axis {name!r}")
        names.append(name)
        sizes.append(size)
    if not names:
        raise ValueError("empty mesh spec")
    return tuple(names), tuple(sizes)


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
    state replicated, batch sharded over 'data' (+spatial H/W), outputs
    replicated.

    The batch sharding is applied via with_sharding_constraint *inside* the
    jitted program rather than in_shardings, so callers may pass batches with
    any placement — fresh host arrays or gathers from a replicated
    DeviceDataStore — and XLA inserts the (local-slice) resharding."""
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh, spatial)

    def wrapped(state, images, masks, key):
        images = jax.lax.with_sharding_constraint(images, bat)
        masks = jax.lax.with_sharding_constraint(masks, bat)
        return step_fn(state, images, masks, key)

    return jax.jit(
        wrapped,
        in_shardings=(rep, None, None, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
