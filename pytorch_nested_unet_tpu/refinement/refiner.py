"""Refiner: the user-facing CascadePSP segmentation-refinement API.

Reference: segmentation-refinement/segmentation_refinement/main.py:13-92.
The reference downloads the released torch weights from Google Drive and strips
their DataParallel `module.` prefixes (main.py:29-40); here weights come from
either (a) `convert_torch_state_dict` applied to that same released `.pth`
file (offline; needs torch only for `torch.load`), or (b) a flax init (random,
for testing / retraining).

refine(image, mask, fast, L) semantics match main.py:59-81: ImageNet-normalize
the image, binarize the mask at 127 and map to ±1, run the fast (global-only)
or full (global+tiled local) pipeline, return a uint8 probability map * 255.
"""

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .driver import process_high_res_im, process_im_single_pass
from .pspnet import RefinementModule

_IM_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IM_STD = np.array([0.229, 0.224, 0.225], np.float32)

# The released CascadePSP weights (reference main.py:29-31 fetches Google
# Drive file id 103nLN1JQCs2yASkna0HqfioYZO7MA_J9). Overridable for mirrors /
# hermetic tests (file:// URLs work).
DEFAULT_WEIGHTS_URL = os.environ.get(
    "SEGMENTATION_REFINEMENT_URL",
    "https://docs.google.com/uc?export=download&confirm=t"
    "&id=103nLN1JQCs2yASkna0HqfioYZO7MA_J9")


class WeightsUnavailable(OSError):
    """Raised when the refinement weights can't be fetched (offline, bad URL,
    checksum mismatch) — callers may fall back or surface the message."""


def fetch_weights(url: str = DEFAULT_WEIGHTS_URL,
                  model_folder: Optional[str] = None,
                  sha256: Optional[str] = None,
                  filename: str = "model") -> str:
    """Download-and-cache the released refinement weights (the reference's
    auto-download, main.py:22-31 + download.py:3-30): cached in
    ~/.segmentation-refinement (the reference's cache dir), optional sha256
    verification, atomic write. Returns the cached path; a cache hit never
    touches the network, so offline use works after one fetch."""
    import hashlib
    import shutil
    import urllib.request

    folder = model_folder or os.path.expanduser("~/.segmentation-refinement")
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    if not os.path.exists(path):
        tmp = path + ".part"
        try:
            with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
            os.replace(tmp, path)
        except Exception as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise WeightsUnavailable(
                f"could not fetch refinement weights from {url}: {e}; "
                f"download the released CascadePSP 'model' file manually into "
                f"{path} or pass model_path=") from e
    if sha256:
        with open(path, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        if digest != sha256:
            os.remove(path)
            raise WeightsUnavailable(
                f"refinement weights checksum mismatch at {path}: "
                f"got {digest}, want {sha256} (corrupt download removed)")
    return path


def _split_torch_key(key: str):
    """Map a released-checkpoint torch key (module. prefix already stripped)
    to (flax_path_tuple, kind). kind: kernel|bias|scale|mean|var|skip."""
    parts = key.split(".")
    suffix = parts[-1]
    kind = {"weight": "weight", "bias": "bias", "running_mean": "mean",
            "running_var": "var", "num_batches_tracked": "skip"}[suffix]
    if kind == "skip":
        return None, "skip"
    body = parts[:-1]

    def conv_or_bn(flax_prefix, is_bn):
        if is_bn:
            return tuple(flax_prefix) + ("bn",), {"weight": "scale", "bias": "bias",
                                                  "mean": "mean", "var": "var"}[kind]
        return tuple(flax_prefix) + ("conv",), {"weight": "kernel", "bias": "bias"}[kind]

    if body[0] == "feats":
        rest = body[1:]
        if rest[0] in ("conv1", "bn1"):
            return conv_or_bn(("feats", rest[0]), rest[0] == "bn1")
        # layerX.i.{conv,bn}{1,2,3} | layerX.i.downsample.{0,1}
        layer, idx = rest[0], rest[1]
        blk = ("feats", f"{layer}_{idx}")
        if rest[2] == "downsample":
            name = "downsample_conv" if rest[3] == "0" else "downsample_bn"
            return conv_or_bn(blk[:-1] + (blk[-1], name), rest[3] == "1")
        return conv_or_bn(blk + (rest[2],), rest[2].startswith("bn"))
    if body[0] == "psp":
        if body[1] == "stages":
            # psp.stages.<k>.1 -> psp/stage<k>_conv
            return conv_or_bn(("psp", f"stage{body[2]}_conv"), False)
        return conv_or_bn(("psp", "bottleneck"), False)
    if body[0].startswith("up_"):
        # up_N.conv.<i> / up_N.conv2.<i> / up_N.shortcut
        if body[1] == "shortcut":
            return conv_or_bn((body[0], "shortcut"), False)
        seqname = f"{body[1]}_{body[2]}"  # conv_0, conv_2, conv2_3, ...
        is_bn = body[2] in ("0", "3")
        return conv_or_bn((body[0], seqname), is_bn)
    if body[0] in ("final_28", "final_56"):
        return conv_or_bn((f"{body[0]}_{body[1]}",), False)
    if body[0] in ("final_11", "final_21"):
        return conv_or_bn((body[0],), False)
    raise KeyError(f"unmapped torch key: {key}")


def convert_torch_state_dict(state_dict) -> Dict:
    """Convert the released CascadePSP torch state_dict (tensors or numpy
    arrays; with or without DataParallel 'module.' prefixes, main.py:35-40)
    into flax variables {'params': ..., 'batch_stats': ...}."""
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
        path, kind = _split_torch_key(key)
        if kind == "skip":
            continue
        arr = np.asarray(getattr(value, "detach", lambda: value)().cpu()
                         if hasattr(value, "detach") else value, np.float32)
        if kind == "kernel":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if kind in ("mean", "var"):
            insert(stats, path + (kind,), jnp.asarray(arr))
        else:
            insert(params, path + (kind,), jnp.asarray(arr))
    return {"params": params, "batch_stats": stats}


def export_torch_style_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict (round-trip testing / interop)."""
    out = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                out[path + (k,)] = np.asarray(v)

    walk(variables["params"], ())
    walk(variables.get("batch_stats", {}), ())

    torch_style = {}
    for path, arr in out.items():
        torch_style[_flax_path_to_torch_key(path)] = (
            arr.transpose(3, 2, 0, 1) if path[-1] == "kernel" else arr)
    return torch_style


def _flax_path_to_torch_key(path) -> str:
    *mods, wrapper, leaf = path
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]

    def mod_to_torch(mods):
        head = mods[0]
        if head == "feats":
            name = mods[1]
            if name in ("conv1", "bn1"):
                return f"feats.{name}"
            layer, idx = name.split("_")
            rest = mods[2] if len(mods) > 2 else None
            if rest == "downsample_conv":
                return f"feats.{layer}.{idx}.downsample.0"
            if rest == "downsample_bn":
                return f"feats.{layer}.{idx}.downsample.1"
            return f"feats.{layer}.{idx}.{rest}"
        if head == "psp":
            name = mods[1]
            if name.startswith("stage"):
                return f"psp.stages.{name[len('stage'):-len('_conv')]}.1"
            return "psp.bottleneck"
        if head.startswith("up_"):
            name = mods[1]
            if name == "shortcut":
                return f"{head}.shortcut"
            seq, idx = name.rsplit("_", 1)
            return f"{head}.{seq}.{idx}"
        if head.startswith("final_28") or head.startswith("final_56"):
            base, idx = head.rsplit("_", 1)
            return f"{base}.{idx}"
        return head  # final_11 / final_21

    return f"{mod_to_torch(mods)}.{suffix}"


class Refiner:
    """CascadePSP refinement front-end (reference main.py:13-81)."""

    def __init__(self, model_path: Optional[str] = None, variables=None,
                 dtype=None, mesh=None, tile_batch: Optional[int] = None,
                 weights_url: str = DEFAULT_WEIGHTS_URL,
                 model_folder: Optional[str] = None,
                 weights_sha256: Optional[str] = None):
        """Load weights from `model_path` (a torch .pth state_dict — the
        released CascadePSP 'model' file — or an .npz of the same keys), or
        take prebuilt flax `variables`, or random-init when neither is given.
        `model_path='auto'` reproduces the reference's download-and-cache
        behavior (main.py:22-31): fetch `weights_url` into `model_folder`
        (default ~/.segmentation-refinement), optionally sha256-verified.

        mesh/tile_batch configure the full (non-fast) pipeline's local pass:
        tiles batched `tile_batch` at a time, and with a mesh, sharded over
        its 'data' axis (see driver.process_high_res_im)."""
        self.model = RefinementModule(dtype=dtype)
        self.mesh = mesh
        self.tile_batch = tile_batch
        if model_path == "auto" and variables is None:
            model_path = fetch_weights(weights_url, model_folder, weights_sha256)
        if variables is not None:
            self.variables = variables
        elif model_path is not None:
            if not os.path.exists(model_path):
                raise FileNotFoundError(
                    f"refinement weights not found: {model_path} "
                    f"(pass model_path='auto' to download-and-cache)")
            if model_path.endswith(".npz"):
                sd = dict(np.load(model_path))
            else:
                import torch

                sd = torch.load(model_path, map_location="cpu")
            self.variables = convert_torch_state_dict(sd)
        else:
            x = jnp.zeros((1, 32, 32, 3), jnp.float32)
            s = jnp.zeros((1, 32, 32, 1), jnp.float32)
            self.variables = self.model.init(jax.random.PRNGKey(0), x, s)

        def apply_fn(im, seg, inter_s8=None, inter_s4=None):
            # jit specializes on the None-ness via two wrappers; variables are
            # passed as arguments (NOT closed over — closing over 67M params
            # would bake ~270MB of constants into the compiled program)
            if inter_s8 is None:
                return self._apply_first(self.variables, im, seg)
            return self._apply_tile(self.variables, im, seg, inter_s8, inter_s4)

        self._apply_first = jax.jit(
            lambda v, im, seg: self.model.apply(v, im, seg, train=False))
        self._apply_tile = jax.jit(
            lambda v, im, seg, s8, s4: self.model.apply(v, im, seg, s8, s4,
                                                        train=False))
        self.apply_fn = apply_fn

    def refine(self, image: np.ndarray, mask: np.ndarray, fast: bool = False,
               L: int = 900) -> np.ndarray:
        """image: HWC uint8 (0..255); mask: HW or HW1 uint8 (binarized at 127).
        Returns the refined mask as HW uint8 (prob * 255), like main.py:81."""
        img = (np.asarray(image, np.float32) / 255.0 - _IM_MEAN) / _IM_STD
        m = np.asarray(mask)
        if m.ndim == 3:
            m = m[..., 0]
        seg = ((m > 127).astype(np.float32) * 255.0 / 255.0 - 0.5) / 0.5
        im = jnp.asarray(img[None])
        sg = jnp.asarray(seg[None, ..., None])
        if fast:
            out = process_im_single_pass(self.apply_fn, im, sg, L)
        else:
            out = process_high_res_im(self.apply_fn, im, sg, L,
                                      mesh=self.mesh, tile_batch=self.tile_batch)
        return (np.asarray(out)[0, ..., 0] * 255).astype(np.uint8)
