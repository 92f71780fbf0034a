"""Device mesh construction and sharding for data (+ optional spatial) parallelism.

Data parallel: batch sharded over the 'data' axis, params/stats replicated.
BN batch statistics are global means over the sharded batch — XLA turns the
jnp.mean reductions inside flax BatchNorm into cross-replica all-reduces over
ICI automatically under GSPMD, which *is* SyncBN (replaces the reference's
vendored master/slave queue protocol, sync_batchnorm/comm.py:18-129).

Spatial parallel ('x'/'y' over H/W) is the CNN analogue of context parallelism
(SURVEY.md §2.5): XLA SPMD partitions convolutions spatially with automatic halo
exchange for the 3x3 stencils.

Tensor parallel ('model' over out-channels) shards conv/dense kernels and their
optimizer state across devices (state_shardings) — the memory lever for models
whose params/optimizer state outgrow one chip's HBM; GSPMD inserts the
activation collectives.
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


def tensor_parallel_spec(leaf, tp: int, min_shardable: int = 16384):
    """PartitionSpec for one parameter/optimizer leaf under channel (tensor)
    parallelism of degree `tp`.

    Conv kernels (HWIO) and Dense kernels (in, out) shard their out-channel
    dim over the 'model' axis when it divides evenly and the tensor is big
    enough to be worth splitting; everything else (biases, BN vectors/stats,
    scalars) stays replicated — they are O(C) and XLA's collectives for them
    would cost more than the memory they save. GSPMD inserts the activation
    all-gathers/reduce-scatters between layers automatically, so alternating
    in/out sharding a la Megatron is unnecessary for correctness; this uniform
    out-channel layout is the memory-saving layout for optimizer state."""
    shape = tuple(getattr(leaf, "shape", ()))
    size = int(np.prod(shape)) if shape else 0
    if size >= min_shardable and shape and shape[-1] % tp == 0:
        if len(shape) == 4:
            return P(None, None, None, "model")
        if len(shape) == 2:
            return P(None, "model")
    return P()


def state_shardings(mesh: Mesh, state, min_shardable: int = 16384):
    """NamedSharding pytree matching `state` (a TrainState or any pytree of
    arrays): channel/tensor parallelism over the mesh's 'model' axis when
    present, fully replicated otherwise.

    Use with ``jax.device_put(state, state_shardings(mesh, state))`` before
    the first sharded step so params AND optimizer-state leaves (same shapes)
    are laid out once; shard_train_step then pins the layout via
    in/out_shardings, keeping it stable across donated steps."""
    if "model" not in mesh.axis_names:
        rep = replicated_sharding(mesh)
        return jax.tree.map(lambda _: rep, state)
    tp = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, tensor_parallel_spec(leaf, tp, min_shardable)), state)


def shard_train_step(step_fn, mesh: Mesh, donate_state: bool = True,
                     spatial: bool = False, state_shardings=None):
    """Wrap an un-jitted step(state, images, masks, key) with pjit shardings:
    state replicated (or per-leaf `state_shardings`, e.g. the tensor-parallel
    layout from parallel.mesh.state_shardings), batch sharded over 'data'
    (+spatial H/W), metrics replicated.

    The batch sharding is applied via with_sharding_constraint *inside* the
    jitted program rather than in_shardings, so callers may pass batches with
    any placement — fresh host arrays or gathers from a replicated
    DeviceDataStore — and XLA inserts the (local-slice) resharding."""
    rep = replicated_sharding(mesh)
    bat = batch_sharding(mesh, spatial)
    st = rep if state_shardings is None else state_shardings

    def wrapped(state, images, masks, key):
        images = jax.lax.with_sharding_constraint(images, bat)
        masks = jax.lax.with_sharding_constraint(masks, bat)
        return step_fn(state, images, masks, key)

    return jax.jit(
        wrapped,
        in_shardings=(st, None, None, rep),
        out_shardings=(st, rep),
        donate_argnums=(0,) if donate_state else (),
    )
