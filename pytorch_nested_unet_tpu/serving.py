"""AOT export: capsule -> self-contained serialized StableHLO serving artifact.

The reference repo has no deployment surface — its closest thing is val.py
re-importing the whole Python model zoo to reload a checkpoint (reference
val.py:34-59). TPU-native serving wants the opposite: `jax.export` AOT-lowers
the jitted predict function — eval-mode forward + the val-pipeline
normalization, with the trained weights baked in as constants — to one
serialized StableHLO module. A serving host loads THAT: no model code, no
checkpoint files, no arch registry, just `jax.export.deserialize` (or any
runtime that executes StableHLO). The batch dimension is exported
symbolically by default, so one artifact serves any batch size; lowering
covers cpu+tpu by default, so the same artifact runs on a TPU pod or a CPU
fallback host.

Artifact layout (out_path is the .jaxexport file):
  <name>.jaxexport        jax.export.Exported.serialize() bytes
  <name>.manifest.json    input/output contract (shapes, dtypes, semantics)
"""

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["export_capsule", "load_exported"]

_OUTPUT_SEMANTICS = (
    "sigmoid probabilities of the final head, NHWC, float; inputs are uint8 "
    "BGR images already resized to (input_h, input_w) — the same convention "
    "as the training loader (cv2.imread) and infer.py"
)


def export_capsule(model_dir: str, out_path: Optional[str] = None,
                   batch: Optional[int] = None,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   precision=None) -> Tuple[str, dict]:
    """Export a trained `models/<name>/` capsule to a serving artifact.

    batch=None exports a symbolic batch dimension (one artifact, any batch);
    an int pins it (one static program — marginally cheaper at load time).
    Returns (out_path, manifest).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .training import checkpoint
    from .training.loop import make_predict_fn

    model, variables, config = checkpoint.load_capsule(model_dir, dtype=precision)
    predict = make_predict_fn(model, config["deep_supervision"])
    params, stats = variables["params"], variables["batch_stats"]

    def serve(images_u8):
        return predict(params, stats, images_u8)

    h, w, c = config["input_h"], config["input_w"], config["input_channels"]
    if batch is None:
        shape = jexport.symbolic_shape(f"b, {h}, {w}, {c}")
    else:
        shape = (int(batch), h, w, c)
    spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(spec)
    blob = exported.serialize()

    if out_path is None:
        out_dir = os.path.join(model_dir, "serving")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, config["name"] + ".jaxexport")
    manifest = {
        "name": config["name"],
        "arch": config["arch"],
        "num_classes": config["num_classes"],
        "input_h": h, "input_w": w, "input_channels": c,
        "img_ext": config.get("img_ext", ".png"),
        "batch": "dynamic" if batch is None else int(batch),
        "input_dtype": "uint8",
        "output_dtype": str(exported.out_avals[0].dtype),
        "output": _OUTPUT_SEMANTICS,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
        "artifact_bytes": len(blob),
    }
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)
    with open(_manifest_path(out_path), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_path, manifest


def _manifest_path(artifact_path: str) -> str:
    base, _ = os.path.splitext(artifact_path)
    return base + ".manifest.json"


def load_exported(artifact_path: str):
    """Load a serving artifact. Returns (predict_u8, manifest) where
    predict_u8(images_u8 NHWC) -> probabilities (manifest['output'])."""
    from jax import export as jexport

    with open(artifact_path, "rb") as f:
        exported = jexport.deserialize(f.read())
    manifest_path = _manifest_path(artifact_path)
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    else:  # contract still recoverable from the artifact itself
        aval = exported.in_avals[0]
        manifest = {"batch": "dynamic" if not isinstance(aval.shape[0], int)
                    else int(aval.shape[0]),
                    "input_h": int(aval.shape[1]), "input_w": int(aval.shape[2]),
                    "input_channels": int(aval.shape[3]),
                    "num_classes": int(exported.out_avals[0].shape[-1]),
                    "img_ext": ".png",
                    "platforms": list(exported.platforms)}

    def predict_u8(images_u8):
        return exported.call(np.asarray(images_u8, np.uint8))

    return predict_u8, manifest
