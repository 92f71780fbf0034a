"""torchvision-pretrained ResNet trunk import.

The reference trains CascadePSP from ImageNet weights by pouring a torchvision
ResNet-50 state_dict into its (modified) trunk, zero-initializing the extra
segmentation input channels (reference cascadePSP_model/psp/extractors.py:12-33
`load_weights_sequential`). This module is the TPU-native equivalent:

  - `convert_torchvision_resnet`: torchvision-format ResNet state_dict
    (resnet18/34/50/101/152: conv1 / bn1 / layerL.i.{convK,bnK,downsample.0/1})
    -> the flax subtree used by BOTH trunk families here:
    models.crdn_backbones._ResNetEncoder (scope 'encoder') and
    refinement.pspnet.DilatedResNet50 (scope 'feats').
  - `graft_trunk`: merge that subtree into an initialized variables pytree at a
    scope path, padding input-channel mismatches with zeros (the 6-channel
    refinement stem surgery, extractors.py:22-29).
  - `load_pretrained_backbone`: .pth file -> converted trunk (lazy torch).

Wired into train.py as `--pretrained_backbone resnet50.pth` for every arch with
a ResNet trunk scope, and usable directly for training RefinementModule.
"""

from typing import Any, Dict, Sequence, Tuple

import numpy as np

_BN_LEAVES = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}


def _as_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_torchvision_resnet(state_dict) -> Dict[str, Dict]:
    """Convert a torchvision-format ResNet state_dict into
    {'params': subtree, 'batch_stats': subtree} matching the flax trunk module
    naming (conv1/bn1/layerL_i/{convK,bnK,downsample_conv,downsample_bn}).
    The classifier head (fc.*) is dropped, like the reference which consumes
    only the trunk (extractors.py:53-107)."""
    params: Dict = {}
    stats: Dict = {}

    def insert(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def put(path_mod, kind_mod, leaf, arr):
        if leaf == "weight" and arr.ndim == 4:
            insert(params, path_mod + (kind_mod, "conv", "kernel"),
                   arr.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        elif leaf in _BN_LEAVES:
            target = _BN_LEAVES[leaf]
            tree = stats if target in ("mean", "var") else params
            insert(tree, path_mod + (kind_mod, "bn", target), arr)
        else:
            raise ValueError(f"unhandled leaf {leaf!r} under {path_mod}")

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith("fc.") or "num_batches_tracked" in key:
            continue
        parts = key.split(".")
        arr = _as_numpy(value)
        if parts[0] in ("conv1", "bn1"):
            put((), parts[0], parts[-1], arr)
        elif parts[0].startswith("layer"):
            mod = (f"{parts[0]}_{parts[1]}",)
            if parts[2] == "downsample":
                # downsample.0 = conv, downsample.1 = bn (torchvision Sequential)
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                put(mod, sub, parts[-1], arr)
            else:
                put(mod, parts[2], parts[-1], arr)
        else:
            raise ValueError(f"unrecognized torchvision ResNet key {key!r}")
    return {"params": params, "batch_stats": stats}


def _subtree(tree, path: Sequence[str]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            raise KeyError(f"no scope {'/'.join(path)} in the variables tree")
        node = node[p]
    return node


def _merge(target: Dict, source: Dict, where: str, stats: list):
    """Copy source leaves over target leaves in place (target is a fresh copy);
    every source leaf must exist in target. A conv kernel whose target wants
    more input channels gets the extra channels zero-initialized (reference
    extractors.py:22-29)."""
    import jax.numpy as jnp

    for k, v in source.items():
        if k not in target:
            raise KeyError(f"pretrained trunk has {where}/{k} but the model "
                           f"does not — wrong depth/arch? model keys there: "
                           f"{sorted(target)[:8]}")
        if isinstance(v, dict):
            _merge(target[k], v, f"{where}/{k}", stats)
            continue
        tgt_shape = tuple(np.shape(target[k]))
        src = np.asarray(v, np.float32)
        if tgt_shape != src.shape:
            if (k == "kernel" and len(tgt_shape) == 4
                    and tgt_shape[:2] == src.shape[:2]
                    and tgt_shape[3] == src.shape[3]
                    and tgt_shape[2] > src.shape[2]):
                pad = np.zeros(tgt_shape[:2] + (tgt_shape[2] - src.shape[2],
                                                tgt_shape[3]), np.float32)
                src = np.concatenate([src, pad], axis=2)
                stats.append(f"{where}/{k}: zero-padded input channels "
                             f"{np.shape(v)[2]} -> {tgt_shape[2]}")
            else:
                raise ValueError(f"shape mismatch at {where}/{k}: "
                                 f"pretrained {src.shape} vs model {tgt_shape}")
        target[k] = jnp.asarray(src)
        stats.append(where + "/" + k)


def graft_trunk(variables, trunk, scope) -> Tuple[Any, int]:
    """Return a copy of `variables` with the converted trunk merged in at
    `scope` (a str or path tuple into both params and batch_stats). Every
    trunk leaf must land on an existing leaf. Returns (variables, n_leaves)."""
    import jax

    if isinstance(scope, str):
        scope = (scope,)
    # deep-copy the dict spine (leaves shared) so the caller's tree is untouched
    new_vars = jax.tree_util.tree_map(lambda x: x, dict(variables))
    loaded: list = []
    _merge(_subtree(new_vars["params"], scope), trunk["params"],
           "/".join(scope), loaded)
    _merge(_subtree(new_vars.get("batch_stats", {}), scope),
           trunk["batch_stats"], "/".join(scope), loaded)
    return new_vars, len(loaded)


def find_trunk_scopes(params: Dict) -> list:
    """Paths of ResNet trunk subtrees in a params tree: dict nodes named
    'encoder' (crdn_backbones) or 'feats' (refinement) containing a conv1
    child. Searched recursively so embedded refinement submodules
    (psp_hybrid archs) are found too."""
    found = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        for k, v in node.items():
            if (k in ("encoder", "feats") and isinstance(v, dict)
                    and "conv1" in v):
                found.append(path + (k,))
            walk(v, path + (k,))

    walk(params, ())
    return found


def load_pretrained_backbone(path: str) -> Dict[str, Dict]:
    """Load a torchvision-format ResNet .pth and convert it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        obj = obj["state_dict"]
    return convert_torchvision_resnet(obj)
