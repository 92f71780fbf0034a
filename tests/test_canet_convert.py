"""CA-Net (Comprehensive_Atten_Unet) full-model checkpoint converter.

Full-forward parity vs the reference is impossible by construction (its UpCat
pads size mismatches with `torch.rand` garbage at forward time,
archs.py:585-590, and its SE pooling windows are hardcoded to (224,300) —
see test_canet_reference_parity.py, which pins every building block
individually). What the converter CAN and must guarantee: the complete
reference state_dict (archs.py:844-959 — conv_block Sequentials, grid
attention gates, the non-local block, SE blocks with Linear MLPs, CBAM scale
attention, dsv heads) maps loss-lessly onto this framework's CA-Net tree and
back. Pinned here: structural+shape equality against model.init through
convert.py's validator, a bit-exact convert->export->convert round trip, a
strict torch load of the export, and the CLI import path.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import convert as convert_cli
from pytorch_nested_unet_tpu.utils.torch_convert import (
    convert_canet_state_dict, export_canet_state_dict,
)

from test_attention_reference_parity import REF, _import_reference_archs

pytestmark = [
    pytest.mark.slow,  # multi-minute: see pyproject fast lane
    pytest.mark.skipif(not REF, reason="no reference checkout"),
]


def _tree_leaves(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_leaves(v, prefix + (k,))
    else:
        yield "/".join(prefix), np.asarray(tree)


@pytest.fixture(scope="module")
def ref_model():
    ref = _import_reference_archs()
    torch.manual_seed(0)
    # reference signature is (args, in_ch, n_classes, ...) with `args` only
    # read for out_size, which the shipped code hardcodes (archs.py:853)
    return ref.Comprehensive_Atten_Unet(None).eval()


def test_canet_conversion_matches_model_tree(ref_model):
    variables = convert_canet_state_dict(ref_model.state_dict())
    config = {"arch": "Comprehensive_Atten_Unet", "num_classes": 2,
              "input_channels": 3, "deep_supervision": False,
              "input_h": 64, "input_w": 64}
    # sys.exits on any missing/extra/mis-shaped leaf
    convert_cli._validate_against_model(variables, config)


def test_canet_export_strict_torch_load_and_roundtrip(ref_model):
    variables = convert_canet_state_dict(ref_model.state_dict())
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_canet_state_dict(variables).items()}
    # strict load: every exported key exists in the reference model and
    # nothing (but the parameterless num_batches_tracked) is missing
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing

    again = convert_canet_state_dict(sd)
    want = dict(_tree_leaves(variables))
    got = dict(_tree_leaves(again))
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_canet_cli_import(ref_model, tmp_path):
    pth = tmp_path / "canet.pth"
    torch.save(ref_model.state_dict(), str(pth))
    model_dir = convert_cli.main([
        "--pth", str(pth), "--arch", "Comprehensive_Atten_Unet",
        "--num_classes", "2", "--input_w", "64", "--input_h", "64",
        "--dataset", "synth", "--name", "canet_import",
        "--output_dir", str(tmp_path / "models")])

    from pytorch_nested_unet_tpu.training import checkpoint
    model, variables, config = checkpoint.load_capsule(model_dir)
    probs = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    probs = np.asarray(probs)
    assert probs.shape == (1, 64, 64, 2)
    # CA-Net's contract: per-pixel softmax probabilities (reference
    # archs.py:900 Softmax2d)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
