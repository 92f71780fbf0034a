"""Checkpointing.

The reference saves best-val-IoU `model.pth` (state_dict only, reference
trains.py:344-349) plus the config.yml capsule; there is no mid-training resume.
We keep that layout and add full resume:

  models/<name>/config.yml     — config capsule (utils.config)
  models/<name>/model.msgpack  — best-IoU {params, batch_stats}  (= model.pth)
  models/<name>/last.msgpack   — full state {params, batch_stats, opt_state,
                                 epoch, best_iou, trigger} for resume
"""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _needs_collective_gather(tree) -> bool:
    """True if any leaf is sharded across processes (multi-host tensor
    parallelism) — sharding metadata is identical on every process, so this
    decision is process-consistent."""
    return any(isinstance(x, jax.Array)
               and not (x.is_fully_addressable or x.is_fully_replicated)
               for x in jax.tree.leaves(tree))


def _to_host(tree):
    """Device -> host numpy. Replicated leaves read their local copy; leaves
    sharded ACROSS processes (multi-host tensor parallelism) need a gather,
    which is a COLLECTIVE — every process must reach this call. File writes
    are separately gated to process 0 (no shared filesystem assumed)."""
    def to_np(x):
        if (isinstance(x, jax.Array)
                and not (x.is_fully_addressable or x.is_fully_replicated)):
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(to_np, tree)


def save_model(model_dir: str, params, batch_stats):
    """Best-IoU model weights (the `model.pth` analogue). Call on EVERY
    process (the host gather under tensor parallelism is collective); only
    process 0 writes."""
    tree = {"params": params, "batch_stats": batch_stats}
    if jax.process_index() != 0 and not _needs_collective_gather(tree):
        return  # plain data parallelism: nothing for non-writers to do
    host = _to_host(tree)
    if jax.process_index() != 0:
        return
    blob = serialization.to_bytes(host)
    with open(os.path.join(model_dir, "model.msgpack"), "wb") as f:
        f.write(blob)


def load_model(model_dir: str, template: Dict[str, Any]):
    """Restore {params, batch_stats} into the given template pytree."""
    with open(os.path.join(model_dir, "model.msgpack"), "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_capsule(model_dir: str, dtype=None):
    """Rebuild a trained model from its `models/<name>/` capsule: read
    config.yml, construct the arch, restore model.msgpack into an init
    template. Returns (model, variables, config) — the one loading path shared
    by val.py / infer.py / convert.py (reference val.py:34-59 semantics)."""
    import jax.numpy as jnp

    from .. import models
    from ..utils.config import load_config

    config = load_config(model_dir)
    # dtype: None = the capsule's training precision; False = force f32
    # compute; or an explicit jnp dtype
    if dtype is False:
        dtype = None
    elif dtype is None and config.get("precision") == "bf16":
        dtype = jnp.bfloat16
    extra = models.parse_arch_kwargs(config["arch"], config.get("arch_kwargs"))
    model = models.create_model(config["arch"], config["num_classes"],
                                config["input_channels"],
                                config["deep_supervision"], dtype=dtype, **extra)
    sample = jnp.zeros((1, config["input_h"], config["input_w"],
                        config["input_channels"]), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), sample, train=True)
    variables = load_model(model_dir, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {})})
    return model, variables, config


def save_training_state(model_dir: str, state, epoch: int, best_iou: float,
                        trigger: int):
    """Full resume state. Call on EVERY process (collective gather under
    multi-host tensor parallelism); only process 0 writes."""
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
    }
    if jax.process_index() != 0 and not _needs_collective_gather(tree):
        return  # plain data parallelism: nothing for non-writers to do
    host = _to_host(tree)
    if jax.process_index() != 0:
        return
    host.update(epoch=epoch, best_iou=float(best_iou), trigger=int(trigger))
    blob = serialization.to_bytes(host)
    tmp = os.path.join(model_dir, "last.msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(model_dir, "last.msgpack"))


def load_training_state(model_dir: str, state):
    """Restore into a freshly-created TrainState; returns
    (state, epoch, best_iou, trigger) or None if no checkpoint exists."""
    path = os.path.join(model_dir, "last.msgpack")
    if not os.path.exists(path):
        return None
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "epoch": 0,
        "best_iou": 0.0,
        "trigger": 0,
    }
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    opt_state = serialization.from_state_dict(state.opt_state, restored["opt_state"])
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=opt_state)
    return state, int(restored["epoch"]), float(restored["best_iou"]), int(restored["trigger"])


# ---- Orbax backend (SURVEY.md §5: "Orbax checkpoints (params + opt_state +
# epoch) plus the same config.yml capsule"). The msgpack format above stays the
# default (single-file, torch-model.pth-like); Orbax adds async-capable,
# sharding-aware checkpointing for multi-host runs where each process writes
# its own shards. ----

def save_training_state_orbax(model_dir: str, state, epoch: int, best_iou: float,
                              trigger: int, name: str = "orbax_last"):
    """Sharding-aware full-state checkpoint via orbax.checkpoint.

    Single-host only: orbax's multi-process save coordinates all processes
    over its own barriers and assumes a shared checkpoint filesystem, which
    this framework's multi-host wiring does not (process-0-only writes, see
    train.py). train.py rejects --checkpoint_backend orbax under multi-host;
    the msgpack backend gathers-and-writes there instead."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, name))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": serialization.to_state_dict(state.opt_state),
            "meta": {"epoch": epoch, "best_iou": float(best_iou),
                     "trigger": int(trigger)},
        }, force=True)


def load_training_state_orbax(model_dir: str, state, name: str = "orbax_last"):
    """Restore a save_training_state_orbax checkpoint into a fresh TrainState;
    returns (state, epoch, best_iou, trigger) or None."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, name))
    if not os.path.isdir(path):
        return None
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": serialization.to_state_dict(state.opt_state),
        "meta": {"epoch": 0, "best_iou": 0.0, "trigger": 0},
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    opt_state = serialization.from_state_dict(state.opt_state, restored["opt_state"])
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=opt_state)
    meta = restored["meta"]
    return state, int(meta["epoch"]), float(meta["best_iou"]), int(meta["trigger"])
