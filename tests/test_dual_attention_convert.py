"""Dual-attention UNetRNN family: converter coverage + parity vs the
reference's OWN classes (archs_backup.py:968-1394).

The three variants have three different conversion stories, each pinned here:

  - UNetRNNCAttention is the only reference-runnable variant (CAM_Module
    ignores its channel argument — it has just a gamma scalar,
    archs_backup.py:913-947), so real reference checkpoints can exist.
    Full-forward parity through convert_crdn_state_dict, both directions.
  - UNetRNNAttention's Attention_block builds PAM/CAM inside `forward`
    (archs_backup.py:950-962): its checkpoints carry NO attention params.
    convert.py synthesizes gamma=0 init-equivalents (numerically identical
    to the reference's forward-constructed modules).
  - UNetRNNPAttention constructs PAM_Module(filters[i]) but applies it to
    n_classes-channel score maps (archs_backup.py:997-1001 vs :1053-1067):
    every reference forward crashes, so checkpoints cannot exist; a
    conversion attempt must fail loudly at shape validation.

The reference file is runtime-imported (never vendored) with stubs for its
unused module-level deps (torchvision/requests via segmentation_refinement).
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

import convert as convert_cli
from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.utils.torch_convert import (
    convert_crdn_state_dict, export_crdn_state_dict,
)

from test_attention_reference_parity import REF, _randomize_bn

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "archs_backup.py")),
    reason="no reference checkout")


def _import_reference_archs_backup():
    """Import archs_backup.py from file. Its module-level
    `from segmentation_refinement...` pulls torchvision/requests, which this
    environment doesn't ship and the dual-attention classes never use — stub
    both, and keep the reference path off sys.path afterwards (it shadows
    repo-root modules like val.py)."""
    stubs = []
    for name, attrs in (("torchvision", {"transforms": types.SimpleNamespace()}),
                        ("torchvision.transforms", {}),
                        ("requests", {"Session": object})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            stubs.append(name)
    sys.path.insert(0, os.path.join(REF, "segmentation-refinement"))
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_archs_backup", os.path.join(REF, "archs_backup.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)
        for name in stubs:
            sys.modules.pop(name, None)


class _cpu_cuda:
    """Reference _init_cell_state hardcodes `.cuda(0)`
    (archs_backup.py:1205-1206); run it on CPU."""

    def __enter__(self):
        self._orig = torch.Tensor.cuda
        torch.Tensor.cuda = lambda t, *a, **k: t

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._orig


def _validated(variables, arch, n_classes=2, hw=32):
    """Route the converted tree through convert.py's structural validation,
    which also prunes the reference's dead RDC gate convs."""
    config = {"arch": arch, "num_classes": n_classes, "input_channels": 3,
              "deep_supervision": False, "input_h": hw, "input_w": hw}
    convert_cli._validate_against_model(variables, config)
    return variables


@pytest.mark.slow  # full hybrid forward vs torch: ~40 s on 1 CPU core; the
# export round-trip below keeps the converter covered in the fast lane
def test_reference_cattention_forward_parity(rng):
    ref = _import_reference_archs_backup()
    torch.manual_seed(0)
    tm = ref.UNetRNNCAttention(2, input_channel=3, decoder="GRU").eval()
    _randomize_bn(tm)
    with torch.no_grad():  # nonzero gammas so the attention path is live
        for i, m in enumerate([tm.CAM_Module1, tm.CAM_Module2, tm.CAM_Module3,
                               tm.CAM_Module4, tm.CAM_Module5]):
            m.gamma.copy_(torch.tensor([0.2 + 0.1 * i]))

    variables = _validated(convert_crdn_state_dict(tm.state_dict()),
                           "UNetRNNCAttention")
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad(), _cpu_cuda():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    jm = models.create_model("UNetRNNCAttention", 2, 3, False)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1), atol=5e-5)


def test_cattention_export_roundtrip(rng):
    ref = _import_reference_archs_backup()
    jm = models.create_model("UNetRNNCAttention", 2, 3, False)
    variables = jm.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 32, 32, 3)), train=True)
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    for i in range(5):  # exercise nonzero gammas through the round trip
        variables["params"][f"CAM_Module{i + 1}"]["gamma"] = \
            np.array([0.15 * (i + 1)], np.float32)

    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_crdn_state_dict(variables).items()}
    torch.manual_seed(1)
    tm = ref.UNetRNNCAttention(2, input_channel=3, decoder="GRU").eval()
    result = tm.load_state_dict(sd, strict=False)
    assert not result.unexpected_keys
    # the only keys we don't synthesize are the reference's dead RDC gates
    assert all(any(g in k for g in ("lstm_catconv", "vanilla_conv"))
               for k in result.missing_keys), result.missing_keys

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad(), _cpu_cuda():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1), atol=5e-5)


def test_convert_cli_unetrnn_attention_synthesizes_attention(tmp_path, capsys):
    ref = _import_reference_archs_backup()
    torch.manual_seed(0)
    tm = ref.UNetRNNAttention(2, input_channel=3, decoder="GRU")
    sd = tm.state_dict()
    assert not any("attention" in k.lower() or "PAM" in k or "CAM" in k
                   for k in sd)  # the reference checkpoint has NO attn params
    pth = tmp_path / "attn.pth"
    torch.save(sd, str(pth))

    model_dir = convert_cli.main([
        "--pth", str(pth), "--arch", "UNetRNNAttention", "--num_classes", "2",
        "--input_w", "32", "--input_h", "32", "--dataset", "synth",
        "--name", "attn_import", "--output_dir", str(tmp_path / "models")])
    out = capsys.readouterr().out
    assert "synthesized" in out and "gamma=0" in out

    from pytorch_nested_unet_tpu.training import checkpoint
    model, variables, config = checkpoint.load_capsule(model_dir)
    for i in range(1, 6):  # synthesized gates start closed, torch-init style
        blk = variables["params"][f"attention_block{i}"]
        assert float(blk["pam"]["gamma"][0]) == 0.0
        assert float(blk["cam"]["gamma"][0]) == 0.0
    probs = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.asarray(probs).shape == (1, 32, 32, 2)


def test_convert_cli_pattention_fails_loudly(tmp_path):
    ref = _import_reference_archs_backup()
    torch.manual_seed(0)
    tm = ref.UNetRNNPAttention(2, input_channel=3, decoder="GRU")
    pth = tmp_path / "pattn.pth"
    torch.save(tm.state_dict(), str(pth))
    with pytest.raises(SystemExit, match="shape mismatch|does not match"):
        convert_cli.main([
            "--pth", str(pth), "--arch", "UNetRNNPAttention",
            "--num_classes", "2", "--input_w", "32", "--input_h", "32",
            "--dataset", "synth", "--name", "pattn_import",
            "--output_dir", str(tmp_path / "models")])


# ---------------------------------------------------------------------------
# fast_rank1 PAM (opt-in grid-interpolated rank-1 attention)


def test_fast_rank1_pam_matches_exact():
    """The opt-in rank-1 fast path approximates the exact PAM closely: the
    attention scores over 1-channel Q/K are rank-1, so every softmax row is
    the same smooth 1-D function — 512 grid points hold the error orders of
    magnitude below the signal at conv-init scales."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu.models.dual_attention import PAMModule

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 1)).astype(np.float32))
    exact = PAMModule()
    fast = PAMModule(fast_rank1=True, grid_size=512)
    variables = exact.init(jax.random.PRNGKey(0), x)
    # gamma=0 at init gates the attention off; force it on for the comparison
    variables = {"params": dict(variables["params"],
                                gamma=jnp.ones((1,), jnp.float32))}
    o_exact = exact.apply(variables, x)
    o_fast = fast.apply(variables, x)
    scale = float(jnp.max(jnp.abs(o_exact)))
    err = float(jnp.max(jnp.abs(o_exact - o_fast)))
    assert err <= 1e-3 * max(scale, 1.0), (err, scale)


def test_fast_rank1_ignored_for_multichannel_qk():
    """qk_ch > 1 (c >= 8) means the scores are no longer rank-1 — the flag
    must fall back to the exact path bitwise."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu.models.dual_attention import PAMModule

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 16)).astype(np.float32))
    exact = PAMModule()
    fast = PAMModule(fast_rank1=True)
    variables = exact.init(jax.random.PRNGKey(0), x)
    a = exact.apply(variables, x)
    b = fast.apply(variables, x)
    assert jnp.array_equal(a, b)


def test_fast_pam_model_flag_trains():
    """UNetRNNPAttention(fast_pam=True) runs a forward+backward step and
    produces finite grads (the interp path is differentiable)."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models

    model = models.create_model("UNetRNNPAttention", 1, 3, False,
                                fast_pam=True, pam_grid=128)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x + 0.5, train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
