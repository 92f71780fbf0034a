"""torchvision-pretrained ResNet trunk import (VERDICT.md round-1 item 5;
reference surgery: cascadePSP_model/psp/extractors.py:12-33)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_nested_unet_tpu.utils.pretrained import (
    convert_torchvision_resnet, find_trunk_scopes, graft_trunk,
)

_REF = os.environ.get("REFERENCE_DIR", "/root/reference")
_HAS_REF = os.path.isfile(os.path.join(_REF, "cascadePSP_model", "psp",
                                       "extractors.py"))


def fake_torchvision_sd(layers=(3, 4, 6, 3), in_ch=3, seed=0):
    """Random state_dict with torchvision ResNet-bottleneck naming/shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, in_ch, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers)):
        for i in range(n):
            base = f"layer{stage + 1}.{i}"
            conv(f"{base}.conv1", planes, inplanes, 1)
            bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2", planes, planes, 3)
            bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3", planes * 4, planes, 1)
            bn(f"{base}.bn3", planes * 4)
            if i == 0:
                conv(f"{base}.downsample.0", planes * 4, inplanes, 1)
                bn(f"{base}.downsample.1", planes * 4)
            inplanes = planes * 4
    sd["fc.weight"] = rng.standard_normal((1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


@pytest.mark.skipif(not _HAS_REF, reason="no reference checkout")
def test_dilated_trunk_feature_parity_vs_reference_extractors():
    """Pour the reference's own (randomly initialized) torch trunk into our
    DilatedResNet50 through the torchvision-format converter and compare all
    three returned feature maps — the functional proof that the key mapping
    and architecture line up."""
    import torch

    # import via a temporary path entry; remove it immediately so top-level
    # names of the reference checkout (val.py, train.py, ...) can never shadow
    # this repo's modules for later tests in the same process
    sys.path.insert(0, _REF)
    try:
        from cascadePSP_model.psp import extractors
    finally:
        sys.path.remove(_REF)

    torch.manual_seed(0)
    tmodel = extractors.resnet50(pretrained=False)
    tmodel.eval()

    x = np.random.default_rng(0).standard_normal((2, 6, 64, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        tf, tx1, tf2 = tmodel(torch.from_numpy(x))

    from pytorch_nested_unet_tpu.refinement.pspnet import DilatedResNet50

    m = DilatedResNet50()
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = m.init(jax.random.PRNGKey(0), xj, train=False)
    trunk = convert_torchvision_resnet(tmodel.state_dict())
    variables, n = graft_trunk(variables, trunk, ())
    assert n == 265  # 53 kernels + 106 BN affine + 106 BN stats
    f, x1, f2 = m.apply(variables, xj, train=False)

    for ours, theirs, name in ((f, tf, "layer4"), (x1, tx1, "stem"),
                               (f2, tf2, "layer1")):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-4, err_msg=name)


def test_zero_pad_surgery_for_6ch_stem():
    """A 3-channel (ImageNet) conv1 poured into the 6-channel refinement stem
    zero-initializes the mask channels (reference extractors.py:22-29)."""
    from pytorch_nested_unet_tpu.refinement.pspnet import DilatedResNet50

    sd = fake_torchvision_sd(in_ch=3)
    m = DilatedResNet50()
    xj = jnp.zeros((1, 32, 32, 6), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), xj, train=False)
    trunk = convert_torchvision_resnet(sd)
    variables, _ = graft_trunk(variables, trunk, ())
    k = np.asarray(variables["params"]["conv1"]["conv"]["kernel"])  # HWIO
    assert k.shape == (7, 7, 6, 64)
    np.testing.assert_array_equal(
        k[:, :, :3, :], sd["conv1.weight"].transpose(2, 3, 1, 0))
    assert (k[:, :, 3:, :] == 0).all()


def test_graft_into_resnet50rnn_encoder_and_mismatch_errors():
    from pytorch_nested_unet_tpu import models

    m = models.create_model("ResNet50RNN", 1, 3, False)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    scopes = find_trunk_scopes(variables["params"])
    assert scopes == [("encoder",)]

    sd = fake_torchvision_sd(in_ch=3)
    trunk = convert_torchvision_resnet(sd)
    grafted, n = graft_trunk(variables, trunk, ("encoder",))
    assert n == 265
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["encoder"]["layer3_2"]["conv2"]["conv"]["kernel"]),
        sd["layer3.2.conv2.weight"].transpose(2, 3, 1, 0))
    # batch_stats landed too
    np.testing.assert_array_equal(
        np.asarray(grafted["batch_stats"]["encoder"]["bn1"]["bn"]["var"]),
        sd["bn1.running_var"])
    # original tree untouched (copy-on-write)
    assert not np.array_equal(
        np.asarray(variables["params"]["encoder"]["conv1"]["conv"]["kernel"]),
        np.asarray(grafted["params"]["encoder"]["conv1"]["conv"]["kernel"]))
    # forward still runs with the grafted weights
    out = m.apply(grafted, x, train=False)
    assert np.isfinite(np.asarray(out)).all()

    # resnet50 weights into a resnet18-style encoder must fail loudly
    m18 = models.create_model("ResNet18RNN", 1, 3, False)
    v18 = m18.init(jax.random.PRNGKey(0), x, train=False)
    with pytest.raises((KeyError, ValueError)):
        graft_trunk(v18, trunk, ("encoder",))


@pytest.mark.slow  # end-to-end CLI training: ~30 s on 1 CPU core
def test_train_cli_pretrained_backbone(tmp_path, capsys):
    """--pretrained_backbone through train.py on a ResNet-backbone arch."""
    import cv2
    import torch

    import train as train_cli

    img_dir = tmp_path / "inputs" / "synth" / "images"
    mask_dir = tmp_path / "inputs" / "synth" / "masks" / "0"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        mask = (rng.random((32, 32)) > 0.7).astype(np.uint8) * 255
        cv2.imwrite(str(img_dir / f"im{i}.png"), img)
        cv2.imwrite(str(mask_dir / f"im{i}.png"), mask)

    pth = tmp_path / "resnet50_fake.pth"
    torch.save({k: torch.from_numpy(v) for k, v in fake_torchvision_sd().items()},
               str(pth))

    train_cli.main([f"--data_dir={tmp_path / 'inputs'}",
                    f"--output_dir={tmp_path / 'models'}",
                    "--dataset=synth", "--input_w=32", "--input_h=32",
                    "--epochs=1", "--batch_size=4", "--precision=fp32",
                    "--arch=ResNet50RNN", "--name=pre_run",
                    f"--pretrained_backbone={pth}"])
    out = capsys.readouterr().out
    assert "pretrained backbone:" in out and "encoder" in out

    with pytest.raises(SystemExit, match="no [rR]esNet trunk|no ResNet trunk"):
        train_cli.main([f"--data_dir={tmp_path / 'inputs'}",
                        f"--output_dir={tmp_path / 'models'}",
                        "--dataset=synth", "--input_w=32", "--input_h=32",
                        "--epochs=1", "--batch_size=4", "--precision=fp32",
                        "--arch=UNet", "--name=pre_bad",
                        f"--pretrained_backbone={pth}"])
