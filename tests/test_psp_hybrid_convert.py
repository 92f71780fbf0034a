"""Checkpoint-converter coverage for the PSP-hybrid archs
(UNetRNNCAttention_PSP / UNetRNNPSP, reference archs_backup.py:1397-1544 and
:1719-1849).

The reference classes checkpoint only their CRDN trunk (+ CAM gammas for the
CAttention variant): the refinement PSPNet is constructed FRESH AND RANDOM
inside every forward (archs_backup.py:1533-1537, :1842-1844) and never lands
in a state_dict.  Import therefore synthesizes the `psp` subtree from this
model's init (or grafts released CascadePSP weights via --refine_pth); export
drops it so the result strict-reloads into the reference class.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import convert as convert_cli
from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.refinement import export_torch_style_state_dict
from pytorch_nested_unet_tpu.training import checkpoint
from pytorch_nested_unet_tpu.utils.torch_convert import converters_for_arch

from test_attention_reference_parity import REF
from test_dual_attention_convert import _import_reference_archs_backup

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "archs_backup.py")),
    reason="no reference checkout")


def test_convert_cli_psp_hybrid_synthesizes_refinement(tmp_path, capsys):
    ref = _import_reference_archs_backup()
    torch.manual_seed(0)
    tm = ref.UNetRNNCAttention_PSP(1, input_channel=3, decoder="GRU")
    sd = tm.state_dict()
    # the reference checkpoint carries the trunk + CAM gammas, but nothing
    # from the forward-time PSPNet
    assert any(k.startswith("CAM_Module") for k in sd)
    assert not any("psp" in k.lower() or "feats" in k for k in sd)
    pth = tmp_path / "hybrid.pth"
    torch.save(sd, str(pth))

    model_dir = convert_cli.main([
        "--pth", str(pth), "--arch", "UNetRNNCAttention_PSP",
        "--num_classes", "1", "--input_w", "32", "--input_h", "32",
        "--dataset", "synth", "--name", "hybrid_import",
        "--output_dir", str(tmp_path / "models")])
    out = capsys.readouterr().out
    assert "synthesized" in out and "--refine_pth" in out

    model, variables, config = checkpoint.load_capsule(model_dir)
    # trunk tensors came from the torch checkpoint (conv1 first kernel)
    want = sd["conv1.conv1.0.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(variables["params"]["conv1"]["conv1"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, want)
    for i in range(1, 6):  # CAM gammas rode the conversion
        assert f"CAM_Module{i}" in variables["params"]
    assert "psp" in variables["params"]  # synthesized refinement subtree
    probs = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    p = np.asarray(probs)
    assert p.shape == (1, 32, 32, 1) and (p >= 0).all() and (p <= 1).all()


@pytest.mark.slow  # CLI subprocess + 67M-param graft; the in-process
# synthesize test above keeps the graft path covered in the fast lane
def test_convert_cli_refine_pth_grafts_cascadepsp_weights(tmp_path):
    ref = _import_reference_archs_backup()
    torch.manual_seed(1)
    tm = ref.UNetRNNPSP(1, input_channel=3, decoder="GRU")
    pth = tmp_path / "trunk.pth"
    torch.save(tm.state_dict(), str(pth))

    # a "released CascadePSP checkpoint": torch-style export of a fresh
    # RefinementModule init (same key schema as the real weights)
    from pytorch_nested_unet_tpu.refinement.pspnet import RefinementModule
    rm = RefinementModule()
    rv = rm.init(jax.random.PRNGKey(7),
                 jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)),
                 train=True)
    refine_sd = export_torch_style_state_dict(rv)
    refine_pth = tmp_path / "cascadepsp.pth"
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in refine_sd.items()}, str(refine_pth))

    model_dir = convert_cli.main([
        "--pth", str(pth), "--arch", "UNetRNNPSP", "--num_classes", "1",
        "--input_w", "32", "--input_h", "32", "--dataset", "synth",
        "--name", "hybrid_graft", "--refine_pth", str(refine_pth),
        "--output_dir", str(tmp_path / "models")])

    _, variables, _ = checkpoint.load_capsule(model_dir)
    flat_want = jax.tree_util.tree_leaves_with_path(dict(rv["params"]))
    flat_got = {jax.tree_util.keystr(kp): leaf for kp, leaf in
                jax.tree_util.tree_leaves_with_path(
                    variables["params"]["psp"])}
    assert len(flat_want) == len(flat_got)
    for kp, leaf in flat_want:
        np.testing.assert_array_equal(
            np.asarray(flat_got[jax.tree_util.keystr(kp)]),
            np.asarray(leaf), err_msg=jax.tree_util.keystr(kp))


def test_refine_pth_rejected_for_non_hybrid(tmp_path):
    with pytest.raises(SystemExit, match="only applies to the PSP-hybrid"):
        convert_cli.main(["--pth", "x.pth", "--arch", "UNetRNN",
                          "--refine_pth", "y.pth"])


def test_export_drops_psp_and_strict_reloads():
    ref = _import_reference_archs_backup()
    jm = models.create_model("UNetRNNCAttention_PSP", 1, 3, False)
    variables = jm.init(jax.random.PRNGKey(2),
                        jnp.zeros((1, 32, 32, 3)), train=True)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          converters_for_arch("UNetRNNCAttention_PSP")[1](variables).items()}
    assert not any("psp" in k.lower() or "feats" in k for k in sd)

    torch.manual_seed(3)
    tm = ref.UNetRNNCAttention_PSP(1, input_channel=3, decoder="GRU")
    result = tm.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    # the only keys we don't export are the reference's dead RDC gate convs
    assert all(any(g in k for g in ("lstm_catconv", "vanilla_conv"))
               for k in result.missing_keys), result.missing_keys
