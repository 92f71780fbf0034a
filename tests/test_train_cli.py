"""End-to-end CLI smoke: train -> checkpoint/logs -> val -> resume (tiny synthetic)."""

import os

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    img_dir = root / "inputs" / "synth" / "images"
    mask_dir = root / "inputs" / "synth" / "masks" / "0"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    for i in range(14):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:32, 0:32]
        cy, cx = rng.integers(10, 22, 2)
        mask = (((yy - cy) ** 2 + (xx - cx) ** 2) < 25).astype(np.uint8) * 255
        img[mask > 0] = 220
        cv2.imwrite(str(img_dir / f"im{i:02d}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i:02d}.png"), mask)
    return root


def _args(root, extra):
    return ([f"--data_dir={root / 'inputs'}", f"--output_dir={root / 'models'}",
             "--dataset=synth", "--input_w=32", "--input_h=32",
             "--epochs=2", "--batch_size=4", "--precision=fp32",
             "--optimizer=Adam"] + extra)


def test_train_val_resume_roundtrip(synth_root):
    import train as train_cli
    import val as val_cli

    best = train_cli.main(_args(synth_root, ["--arch=NestedUNet",
                                             "--deep_supervision=true"]))
    mdir = synth_root / "models" / "synth_NestedUNet_wDS"
    assert (mdir / "config.yml").exists()
    assert (mdir / "model.msgpack").exists()
    assert (mdir / "last.msgpack").exists()
    log = (mdir / "log.csv").read_text().strip().splitlines()
    assert log[0] == "epoch,lr,loss,iou,val_loss,val_iou"
    assert len(log) == 3  # header + 2 epochs

    # val reproduces the checkpointed best IoU on the same split
    iou = val_cli.main([f"--name=synth_NestedUNet_wDS",
                        f"--data_dir={synth_root / 'inputs'}",
                        f"--output_dir={synth_root / 'models'}",
                        f"--save_dir={synth_root / 'outputs'}"])
    assert iou == pytest.approx(best, abs=1e-4)
    outs = list((synth_root / "outputs" / "synth_NestedUNet_wDS" / "0").iterdir())
    assert len(outs) == 3  # 20% of 14 -> 3 val images

    # resume continues to epoch 4
    train_cli.main(_args(synth_root, ["--arch=NestedUNet", "--deep_supervision=true",
                                      "--epochs=4", "--resume=true"]))
    log = (mdir / "log.csv").read_text().strip().splitlines()
    assert len(log) == 5


def test_train_lovasz_unet(synth_root):
    import train as train_cli

    best = train_cli.main(_args(synth_root, ["--arch=UNet", "--loss=LovaszHingeLoss",
                                             "--name=lovasz_run"]))
    assert np.isfinite(best)


def test_train_early_stopping(synth_root):
    import train as train_cli

    train_cli.main(_args(synth_root, ["--arch=UNet", "--name=early_run",
                                      "--epochs=6", "--early_stopping=1",
                                      "--lr=0.0"]))  # lr 0: no improvement after ep 0
    log = (synth_root / "models" / "early_run" / "log.csv").read_text().strip().splitlines()
    assert len(log) < 7  # stopped early


def test_arch_kwargs_roundtrip(synth_root):
    """--arch_kwargs reaches the constructor AND is honored when val.py
    rebuilds the model from the capsule (a vanilla-RNN decoder has a different
    param tree than the GRU default, so restore would fail if ignored)."""
    import pytest

    import train as train_cli
    import val as val_cli

    best = train_cli.main(_args(synth_root, [
        "--arch=UNetRNN", "--name=kw_run",
        '--arch_kwargs={"decoder": "vanilla"}']))
    iou = val_cli.main(["--name=kw_run",
                        f"--data_dir={synth_root / 'inputs'}",
                        f"--output_dir={synth_root / 'models'}",
                        f"--save_dir={synth_root / 'outputs'}"])
    assert iou == pytest.approx(best, abs=1e-4)

    with pytest.raises(SystemExit, match="no field"):
        train_cli.main(_args(synth_root, ["--arch=UNet", "--name=kw_bad",
                                          '--arch_kwargs={"nope": 1}']))
