"""Cross-framework accuracy parity (VERDICT.md round-1 item 1): the reference's
own torch model defs trained side-by-side with this framework on identical
data/init/schedule must produce matching trajectories and interchangeable
checkpoints. Requires an upstream reference checkout + torch; skipped where
absent."""

import os

import pytest


_REF = os.environ.get("REFERENCE_DIR", "/root/reference")

pytestmark = [pytest.mark.slow,  # multi-minute end-to-end run
              pytest.mark.skipif(
    not os.path.isfile(os.path.join(_REF, "finished", "archs1.py")),
    reason="no reference checkout available")]


def test_parity_quick_unet():
    import parity

    # gates ~10x the demonstrated precision (recorded runs reach 1e-6-class
    # epoch-0 gaps for this family) so a real semantic regression can't hide
    # inside the default slack (VERDICT r2 weak #6)
    result = parity.main(["--quick", "--reference", _REF,
                          "--tol_first_loss", "1e-4", "--tol_logits", "5e-5",
                          "--out", os.path.join(
                              os.environ.get("TMPDIR", "/tmp"),
                              "parity_quick.json")])
    assert result["ok"], result["checks"]
    # the curves genuinely moved (training happened, not a frozen model)
    assert result["our_curves"]["loss"][-1] < result["our_curves"]["loss"][0]


def test_parity_quick_lovasz():
    """LovaszHinge path: our on-device argsort/cumsum Lovász vs the
    reference's vendored lovasz_hinge (reference losses.py:49-96), same
    protocol."""
    import parity

    # LovaszHinge genuinely needs a looser epoch-0 gate (the argsort tie-break
    # order is float-chaotic at equal errors; recorded runs sit ~1.5e-3) but
    # the converted-weights logits path is exact — gate it tightly.
    result = parity.main(["--quick", "--loss", "LovaszHingeLoss",
                          "--reference", _REF,
                          "--tol_logits", "5e-5",
                          "--out", os.path.join(
                              os.environ.get("TMPDIR", "/tmp"),
                              "parity_quick_lovasz.json")])
    assert result["ok"], result["checks"]


def test_parity_quick_multiclass_cattention():
    """Multiclass (2 per-channel classes) through the dual-attention family:
    the reference's own UNetRNNCAttention (archs_backup.py:1109-1250, the one
    CPU-runnable dual-attention hybrid) vs ours, CAM channel gram
    non-degenerate at C=2. Cross-logit equality covers BOTH class channels."""
    import parity

    result = parity.main(["--arch", "UNetRNNCAttention", "--num_classes", "2",
                          "--decoder", "vanilla", "--epochs", "2",
                          "--batch_size", "4", "--size", "32",
                          "--n_train", "16", "--n_val", "8",
                          "--tol_first_loss", "1e-4", "--tol_logits", "5e-5",
                          "--reference", _REF,
                          "--out", os.path.join(
                              os.environ.get("TMPDIR", "/tmp"),
                              "parity_quick_catt.json")])
    assert result["ok"], result["checks"]
    assert result["our_curves"]["loss"][-1] < result["our_curves"]["loss"][0]


def test_parity_quick_vgg16rnn_lstm():
    """CRDN.py backbone family + the ConvLSTM RDC cell: the reference's own
    VGG16RNN (CRDN.py:250-407, zero-state .cuda pin neutralized the way the
    author's CPU edits do) vs ours, decoder=LSTM — exercises the k//2-padding
    RDC (CRDN.py:20), the dead `score.` head allowlist, and the (h, c) carry
    through all five scales."""
    import parity

    result = parity.main(["--arch", "VGG16RNN", "--decoder", "LSTM",
                          "--epochs", "2", "--batch_size", "4",
                          "--size", "32", "--n_train", "16", "--n_val", "8",
                          "--tol_first_loss", "1e-4", "--tol_logits", "5e-5",
                          "--reference", _REF,
                          "--out", os.path.join(
                              os.environ.get("TMPDIR", "/tmp"),
                              "parity_quick_vgg16rnn.json")])
    assert result["ok"], result["checks"]
    assert result["our_curves"]["loss"][-1] < result["our_curves"]["loss"][0]


def test_parity_refuses_undefined_reference_paths():
    """The harness refuses, with the documented reason, the reference defs
    whose training dynamics cannot be reproduced: ResNet50RNN's LSTM branch
    (6-value unpack of the 2-value RDC return, CRDN.py:558-563) and
    ResNet50FCN (active Dropout2d in the classifier, CRDN.py:808/812)."""
    import parity

    with pytest.raises(SystemExit, match="LSTM branch unpacks 6"):
        parity._build_ref_model(_REF, "ResNet50RNN", False, "LSTM")
    with pytest.raises(SystemExit, match="Dropout2d"):
        parity._build_ref_model(_REF, "ResNet50FCN", False, "vanilla")
