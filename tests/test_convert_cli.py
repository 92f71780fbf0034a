"""convert.py CLI: reference .pth -> val-ready capsule; export round-trip;
wrong-arch detection."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import convert as convert_cli
from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.training import checkpoint
from pytorch_nested_unet_tpu.utils.config import load_config
from test_torch_convert import TorchNestedUNet

pytestmark = pytest.mark.slow  # multi-minute: see pyproject fast lane


def _reference_pth(tmp_path, wrap_data_parallel=False):
    torch.manual_seed(3)
    tm = TorchNestedUNet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.8, 1.2)
    sd = tm.state_dict()
    if wrap_data_parallel:  # reference trains through .cuda(); DP adds module.
        sd = {"module." + k: v for k, v in sd.items()}
    path = str(tmp_path / "model.pth")
    torch.save(sd, path)
    return tm, path


def test_import_builds_val_ready_capsule(tmp_path):
    tm, pth = _reference_pth(tmp_path, wrap_data_parallel=True)
    out_dir = str(tmp_path / "models")
    model_dir = convert_cli.main([
        "--pth", pth, "--arch", "NestedUNet", "--deep_supervision", "true",
        "--input_w", "32", "--input_h", "32", "--output_dir", out_dir,
        "--name", "imported"])
    assert os.path.exists(os.path.join(model_dir, "config.yml"))
    config = load_config(model_dir)
    assert config["arch"] == "NestedUNet" and config["deep_supervision"]

    # capsule weights reproduce the torch model's prediction (val.py semantics:
    # final head, eval mode)
    jm = models.create_model("NestedUNet", 1, 3, True)
    template = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    variables = checkpoint.load_model(
        model_dir, {k: template[k] for k in ("params", "batch_stats")})
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2)))[-1].numpy()
    got = jm.apply(variables, jnp.asarray(x), train=False)[-1]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), expect,
                               atol=5e-5)


def test_export_round_trips_tensors(tmp_path):
    _, pth = _reference_pth(tmp_path)
    out_dir = str(tmp_path / "models")
    convert_cli.main(["--pth", pth, "--arch", "NestedUNet",
                      "--deep_supervision", "true", "--input_w", "32",
                      "--input_h", "32", "--output_dir", out_dir,
                      "--name", "imported"])
    out_pth = str(tmp_path / "back.pth")
    convert_cli.main(["--export", "--name", "imported", "--output_dir", out_dir,
                      "--out", out_pth])
    orig = torch.load(pth, map_location="cpu", weights_only=True)
    back = torch.load(out_pth, map_location="cpu", weights_only=True)
    # num_batches_tracked counters aren't part of the functional state
    orig = {k: v for k, v in orig.items() if not k.endswith("num_batches_tracked")}
    assert set(orig) == set(back)
    for k in orig:
        np.testing.assert_allclose(back[k].numpy(), orig[k].numpy(), atol=1e-6,
                                   err_msg=k)


def test_wrong_arch_fails_loudly(tmp_path):
    _, pth = _reference_pth(tmp_path)
    with pytest.raises(SystemExit, match="does not match UNet"):
        convert_cli.main(["--pth", pth, "--arch", "UNet", "--input_w", "32",
                          "--input_h", "32",
                          "--output_dir", str(tmp_path / "models")])
