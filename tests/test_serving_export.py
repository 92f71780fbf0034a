"""AOT serving export: capsule -> StableHLO artifact -> inference parity.

The reference has no deployment surface (its val.py re-imports the model zoo,
reference val.py:34-59); `export.py`/`serving.py` are the TPU-native
equivalent: jax.export AOT-lowers the predict function with weights baked in.
These tests pin the contract: round-trip numerical equality with the live
model, a symbolic batch dimension, and the no-model-code serving path through
`infer.py --artifact`.
"""

import json
import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import export as export_cli
import infer as infer_cli
from pytorch_nested_unet_tpu import models, serving
from pytorch_nested_unet_tpu.training import checkpoint
from pytorch_nested_unet_tpu.training.loop import make_predict_fn
from pytorch_nested_unet_tpu.utils import save_config


@pytest.fixture(scope="module")
def capsule(tmp_path_factory):
    root = tmp_path_factory.mktemp("aot")
    config = {"arch": "UNet", "num_classes": 2, "input_channels": 3,
              "deep_supervision": False, "input_h": 32, "input_w": 32,
              "dataset": "synth", "img_ext": ".png", "mask_ext": ".png",
              "dataset_layout": "generic", "precision": "fp32",
              "name": "aot_run", "loss": "BCEDiceLoss"}
    model_dir = root / "models" / "aot_run"
    model_dir.mkdir(parents=True)
    save_config(config, str(model_dir))
    m = models.create_model("UNet", 2, 3, False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    checkpoint.save_model(str(model_dir), v["params"], v["batch_stats"])

    img_dir = root / "raw"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    return root


def test_export_cli_roundtrip_and_manifest(capsule):
    # --check true re-verifies the artifact against the live model in-CLI
    out = export_cli.main(["--name", "aot_run",
                           "--output_dir", str(capsule / "models"),
                           "--platforms", "cpu,tpu", "--check", "true"])
    assert out == str(capsule / "models" / "aot_run" / "serving" /
                      "aot_run.jaxexport")
    assert os.path.exists(out)
    with open(os.path.splitext(out)[0] + ".manifest.json") as f:
        manifest = json.load(f)
    assert manifest["batch"] == "dynamic"
    assert manifest["num_classes"] == 2
    assert manifest["input_dtype"] == "uint8"
    assert set(manifest["platforms"]) == {"cpu", "tpu"}


def test_dynamic_batch_matches_live_model(capsule):
    model_dir = str(capsule / "models" / "aot_run")
    path, _ = serving.export_capsule(model_dir, platforms=("cpu",))
    predict_u8, manifest = serving.load_exported(path)

    model, variables, config = checkpoint.load_capsule(model_dir)
    live = make_predict_fn(model, config["deep_supervision"])
    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: one artifact, any batch size
        images = rng.integers(0, 255, (b, 32, 32, 3), dtype=np.uint8)
        got = np.asarray(predict_u8(images), np.float32)
        want = np.asarray(live(variables["params"], variables["batch_stats"],
                               jnp.asarray(images)), np.float32)
        assert got.shape == (b, 32, 32, 2)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pinned_batch_rejects_other_sizes(capsule):
    model_dir = str(capsule / "models" / "aot_run")
    path, manifest = serving.export_capsule(
        model_dir, out_path=str(capsule / "pinned.jaxexport"),
        batch=2, platforms=("cpu",))
    assert manifest["batch"] == 2
    predict_u8, _ = serving.load_exported(path)
    ok = predict_u8(np.zeros((2, 32, 32, 3), np.uint8))
    assert np.asarray(ok).shape == (2, 32, 32, 2)
    with pytest.raises(Exception):
        predict_u8(np.zeros((3, 32, 32, 3), np.uint8))


def test_infer_cli_serves_artifact_without_capsule(capsule, tmp_path):
    artifact = str(capsule / "models" / "aot_run" / "serving" /
                   "aot_run.jaxexport")
    if not os.path.exists(artifact):
        artifact, _ = serving.export_capsule(
            str(capsule / "models" / "aot_run"))
    n = infer_cli.main(["--artifact", artifact,
                        "--input_dir", str(capsule / "raw"),
                        "--save_dir", str(tmp_path / "out"), "-b", "2"])
    assert n == 6  # 3 images x 2 classes
    for c in range(2):
        outs = sorted((tmp_path / "out" / "aot_run" / str(c)).iterdir())
        assert [p.stem for p in outs] == ["im0", "im1", "im2"]

    # artifact path and capsule path produce the same masks
    infer_cli.main(["--name", "aot_run", "--input_dir", str(capsule / "raw"),
                    "--output_dir", str(capsule / "models"),
                    "--save_dir", str(tmp_path / "out_live"), "-b", "2"])
    a = cv2.imread(str(tmp_path / "out" / "aot_run" / "1" / "im0.png"),
                   cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(str(tmp_path / "out_live" / "aot_run" / "1" / "im0.png"),
                   cv2.IMREAD_GRAYSCALE)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_manifest_recovered_from_artifact_alone(capsule, tmp_path):
    # serving host with only the .jaxexport file: contract comes from avals
    model_dir = str(capsule / "models" / "aot_run")
    path, _ = serving.export_capsule(
        model_dir, out_path=str(tmp_path / "bare.jaxexport"),
        platforms=("cpu",))
    os.remove(str(tmp_path / "bare.manifest.json"))
    predict_u8, manifest = serving.load_exported(path)
    assert manifest["batch"] == "dynamic"
    assert manifest["input_h"] == 32 and manifest["num_classes"] == 2
    out = predict_u8(np.zeros((1, 32, 32, 3), np.uint8))
    assert np.asarray(out).shape == (1, 32, 32, 2)
