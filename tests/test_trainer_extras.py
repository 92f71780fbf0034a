"""ISIC trainer presets, acc logging, physical train/test layout, plotting."""

import os
import sys

import cv2
import numpy as np
import pandas as pd
import pytest

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_isic_tree(root, n_train=6, n_test=4, hw=32):
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("test", n_test)):
        img_dir = os.path.join(root, "ISIC", split, "image")
        mask_dir = os.path.join(root, "ISIC", split, "mask")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        for i in range(n):
            m = np.zeros((hw, hw), np.uint8)
            cv2.circle(m, (int(rng.integers(6, hw - 6)), int(rng.integers(6, hw - 6))),
                       int(rng.integers(3, 7)), 255, -1)
            img = np.stack([m // 2 + 40, m // 3 + 30, m // 4 + 20], -1).astype(np.uint8)
            cv2.imwrite(os.path.join(img_dir, f"{split}{i}.jpg"), img)
            cv2.imwrite(os.path.join(mask_dir, f"{split}{i}_segmentation.png"), m)


@pytest.mark.slow  # end-to-end preset training, like the other CLI trainings
def test_isic_wacc_preset_end_to_end(tmp_path, monkeypatch):
    """train_isic_wacc preset: physical train/test dirs (train_ISIC.py:268-280),
    `_segmentation` mask naming (dataset.py:131-133), acc log columns
    (trainISIC_wAcc.py:339-368)."""
    sys.path.insert(0, _repo)
    import train_isic_wacc

    _make_isic_tree(str(tmp_path / "inputs"))
    monkeypatch.chdir(tmp_path)
    train_isic_wacc.main([
        "--epochs", "1", "--batch_size", "4", "--input_w", "32", "--input_h", "32",
        "--data_dir", str(tmp_path / "inputs"),
        "--output_dir", str(tmp_path / "models"),
        "--precision", "fp32", "--arch", "UNet",
    ])
    run_dir = tmp_path / "models" / "ISIC_UNet_woDS"
    log = pd.read_csv(run_dir / "log.csv")
    assert list(log.columns) == ["epoch", "lr", "loss", "iou", "acc",
                                 "val_loss", "val_iou", "val_acc"]
    assert len(log) == 1
    assert 0.0 <= log["val_acc"][0] <= 1.0
    assert (run_dir / "config.yml").exists()


def test_plot_data_writes_pngs(tmp_path):
    from pytorch_nested_unet_tpu.utils.plotting import plot_data

    df = pd.DataFrame({
        "epoch": range(30), "lr": [1e-3] * 30,
        "loss": np.linspace(1, 0.2, 30), "iou": np.linspace(0.1, 0.8, 30),
        "acc": np.linspace(0.5, 0.9, 30),
        "val_loss": np.linspace(1.1, 0.3, 30), "val_iou": np.linspace(0.1, 0.75, 30),
        "val_acc": np.linspace(0.5, 0.88, 30),
    })
    log = tmp_path / "log.csv"
    df.to_csv(log, index=False)
    written = plot_data(str(log), every=10)
    assert len(written) == 3  # loss, iou, acc
    for f in written:
        assert os.path.exists(f) and os.path.getsize(f) > 0


@pytest.mark.slow  # CA-Net fwd+grad compile: ~55 s on 1 CPU core
def test_canet_binary_returns_trainable_logits():
    """num_classes=1: raw logit output (Softmax2d over one channel is the
    constant 1 — reference quirk, archs.py:900); gradients flow."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.losses import bce_dice_loss

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray((np.random.default_rng(1).random((1, 32, 32, 1)) > 0.5),
                    jnp.float32)
    m = models.Comprehensive_Atten_Unet(num_classes=1, out_size=(32, 32))
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out = m.apply(variables, x, train=False)
    # softmax over 1 channel would be identically 1.0; logits are not
    assert not np.allclose(np.asarray(out), 1.0)

    def loss_fn(params):
        o, _ = m.apply({"params": params, "batch_stats": variables["batch_stats"]},
                       x, train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(2)})
        return bce_dice_loss(o, y)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


@pytest.mark.slow  # two full CLI subprocess trainings: ~50 s on 1 CPU core
def test_graceful_preemption(tmp_path, monkeypatch):
    """SIGTERM mid-training: finish the epoch, checkpoint, exit 0; --resume
    continues from the next epoch (the reference has no recovery story,
    SURVEY.md §5)."""
    import signal
    import subprocess
    import time as _time

    _make_isic_tree(str(tmp_path / "inputs"), n_train=6, n_test=4)
    # --platform cpu: subprocesses can't inherit conftest's in-process CPU
    # pinning, and the remote-TPU tunnel sporadically stalls compiles for
    # minutes, which is flakiness this test isn't about
    args = [
        sys.executable, os.path.join(_repo, "train_isic.py"),
        "--epochs", "200", "--batch_size", "4", "--input_w", "16", "--input_h", "16",
        "--data_dir", str(tmp_path / "inputs"), "--output_dir", str(tmp_path / "models"),
        "--precision", "fp32", "--arch", "UNet", "--name", "preempt",
        "--platform", "cpu",
    ]
    proc = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, cwd=str(tmp_path))
    # wait for the first epoch lines, then preempt
    deadline = _time.time() + 600
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("epoch [1/"):
            proc.send_signal(signal.SIGTERM)
            break
        assert _time.time() < deadline, "".join(lines)
    out, _ = proc.communicate(timeout=240)
    lines.append(out)
    text = "".join(lines)
    assert proc.returncode == 0, text
    assert "preempted at epoch" in text, text
    run_dir = tmp_path / "models" / "preempt"
    assert (run_dir / "last.msgpack").exists()

    # resume picks up from the interrupted point
    res = subprocess.run(args + ["--resume", "true", "--epochs", "4"],
                         capture_output=True, text=True, cwd=str(tmp_path),
                         timeout=480)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "resumed from epoch" in res.stdout, res.stdout
