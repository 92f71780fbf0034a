"""torch state_dict -> flax variables converter for the flagship models.

Lets a user of the reference bring reference-trained `model.pth` weights
(UNet / NestedUNet, reference archs_backup.py:46-152, saved by trains.py:344-349)
into this framework for inference or fine-tuning — the "config capsule +
weights" migration path (SURVEY.md §5 checkpoint/resume).

Mapping is mechanical because module names match the reference's attribute
names by design: `conv0_0.conv1.weight` -> params/conv0_0/conv1/conv/kernel
(OIHW->HWIO), `conv0_0.bn1.{weight,bias,running_mean,running_var}` ->
params/conv0_0/bn1/{scale,bias} + batch_stats/conv0_0/bn1/{mean,var}.
Works for any model here whose torch counterpart uses named attributes (not
nn.Sequential indices) — the UNet/NestedUNet family; the CascadePSP network
has its own converter (refinement.convert_torch_state_dict).
"""

from typing import Any, Dict

import numpy as np

_BN_LEAVES = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}


def _as_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_reference_state_dict(state_dict: Dict[str, Any]):
    """Convert a torch state_dict (tensors or arrays; optional DataParallel
    'module.' prefixes) into {'params': ..., 'batch_stats': ...}."""
    params: Dict = {}
    stats: Dict = {}

    def insert(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        if leaf == "num_batches_tracked":
            continue
        arr = _as_numpy(value)
        # conv weight is 4D; a 1D bias belongs to a conv iff its sibling
        # weight is 4D; everything else 1D is batch-norm affine/stats
        if leaf == "weight" and arr.ndim == 4:
            insert(params, tuple(mods) + ("conv", "kernel"),
                   arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif leaf == "bias" and _sibling_is_conv(state_dict, mods):
            insert(params, tuple(mods) + ("conv", "bias"), arr)
        elif leaf in ("weight", "bias"):
            insert(params, tuple(mods) + (_BN_LEAVES[leaf],), arr)
        elif leaf in ("running_mean", "running_var"):
            insert(stats, tuple(mods) + (_BN_LEAVES[leaf],), arr)
        else:
            raise KeyError(f"unrecognized torch key: {key}")
    return {"params": params, "batch_stats": stats}


def _sibling_is_conv(state_dict, mods) -> bool:
    for prefix in (".".join(mods), "module." + ".".join(mods)):
        w = state_dict.get(prefix + ".weight")
        if w is not None:
            return _as_numpy(w).ndim == 4
    return False


def export_reference_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse: flax variables -> torch-style state_dict (round-trip/interop)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,), collection)
                continue
            arr = np.asarray(v)
            if path and path[-1] == "conv" or (k == "kernel"):
                base = ".".join(path[:-1] if path[-1] == "conv" else path)
                if k == "kernel":
                    out[base + ".weight"] = arr.transpose(3, 2, 0, 1)
                else:
                    out[base + ".bias"] = arr
            else:
                base = ".".join(path)
                name = {"scale": "weight", "bias": "bias",
                        "mean": "running_mean", "var": "running_var"}[k]
                out[base + "." + name] = arr

    walk(variables["params"], (), "params")
    walk(variables.get("batch_stats", {}), (), "stats")
    return out
