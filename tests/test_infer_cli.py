"""infer.py CLI: capsule + raw images -> masks, no labels required."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import infer as infer_cli
from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.training import checkpoint
from pytorch_nested_unet_tpu.utils import save_config


@pytest.fixture(scope="module")
def capsule(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    config = {"arch": "UNet", "num_classes": 1, "input_channels": 3,
              "deep_supervision": False, "input_h": 32, "input_w": 32,
              "dataset": "synth", "img_ext": ".png", "mask_ext": ".png",
              "dataset_layout": "generic", "precision": "fp32",
              "name": "serve_run", "loss": "BCEDiceLoss"}
    model_dir = root / "models" / "serve_run"
    model_dir.mkdir(parents=True)
    save_config(config, str(model_dir))
    m = models.create_model("UNet", 1, 3, False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    checkpoint.save_model(str(model_dir), v["params"], v["batch_stats"])

    img_dir = root / "raw"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):  # 5 images, batch 2 -> 3 batches incl. a padded one
        cv2.imwrite(str(img_dir / f"im{i}.png"),
                    rng.integers(0, 255, (48, 40, 3), dtype=np.uint8))
    return root


def test_infer_writes_probability_masks(capsule):
    n = infer_cli.main(["--name", "serve_run", "--input_dir", str(capsule / "raw"),
                        "--output_dir", str(capsule / "models"),
                        "--save_dir", str(capsule / "out"), "-b", "2"])
    assert n == 5
    outs = sorted((capsule / "out" / "serve_run" / "0").iterdir())
    assert [p.stem for p in outs] == [f"im{i}" for i in range(5)]
    m = cv2.imread(str(outs[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (32, 32)  # capsule input size by default
    assert 0 < m.mean() < 255  # probabilities, not saturated


def test_infer_threshold_and_full_res(capsule):
    infer_cli.main(["--name", "serve_run", "--input_dir", str(capsule / "raw"),
                    "--output_dir", str(capsule / "models"),
                    "--save_dir", str(capsule / "out_hard"), "-b", "4",
                    "--threshold", "0.5", "--full_res", "true"])
    m = cv2.imread(str(capsule / "out_hard" / "serve_run" / "0" / "im0.png"),
                   cv2.IMREAD_GRAYSCALE)
    assert m.shape == (48, 40)  # original resolution restored
    # default .png output is lossless: thresholded masks are TRULY binary
    assert np.isin(m, (0, 255)).all()


def test_infer_missing_images_exit(capsule):
    with pytest.raises(SystemExit, match="no images"):
        infer_cli.main(["--name", "serve_run",
                        "--input_dir", str(capsule / "nowhere"),
                        "--output_dir", str(capsule / "models")])
