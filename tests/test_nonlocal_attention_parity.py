"""Forward parity for multi_head_attention_2d against the reference's OWN code.

Runtime-imports /root/reference/archs.py (never vendored) and transplants the
reference block's weights through the generic state-dict converter (attribute
names match: QueryTransform/KeyTransform/ValueTransform/outputConv).

Parity is pinned at batch=1, num_heads=1 BY CONSTRUCTION: the reference's
forward flattens (B, Hq, Wq, N) into ONE axis and runs a single
matmul+softmax over it (archs.py:1043-1053, `torch.flatten(k, 0, 3)` then
`softmax(dim=1)`), so each query attends across OTHER BATCH ITEMS and OTHER
HEADS — a quirk of the vendored torch port. This framework implements proper
per-batch, per-head attention (models/nonlocal_attention.py einsum). The
second test demonstrates the divergence: the reference's output for image 0
changes when image 1 changes; ours does not.
"""

import importlib.util
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.utils.torch_convert import convert_reference_state_dict

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "archs.py")),
    reason="no reference checkout")


def _import_reference_archs():
    """Import archs.py with fastai stubbed (module-level import used only by
    the dead DoubleUnet code, archs.py:21,1080-1239)."""
    stubbed = []
    for name in ("fastai", "fastai.vision"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.create_body = lambda *a, **k: None
            sys.modules[name] = mod
            stubbed.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_archs_mha", os.path.join(REF, "archs.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)


def _build_pair(ref, layer_type, num_heads, seed=0):
    torch.manual_seed(seed)
    tm = ref.multi_head_attention_2d(
        in_channel=3, key_filters=16, value_filters=16, output_filters=40,
        num_heads=num_heads, dropout_prob=0.5, layer_type=layer_type).eval()
    jm = models.MultiHeadAttention2D(
        key_filters=16, value_filters=16, output_filters=40,
        num_heads=num_heads, dropout_prob=0.5, layer_type=layer_type)
    variables = convert_reference_state_dict(tm.state_dict())
    return tm, jm, {"params": variables["params"]}


@pytest.mark.parametrize("layer_type", ["SAME", "DOWN", "UP"])
def test_reference_mha_forward_parity(layer_type):
    """batch=1, heads=1: the flattened formulation coincides with per-head
    attention, so the transplanted forward must match (reference
    archs.py:964-1077)."""
    ref = _import_reference_archs()
    tm, jm, variables = _build_pair(ref, layer_type, num_heads=1)

    x = np.random.default_rng(3).normal(size=(1, 3, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()          # NCHW
    got = jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)                          # NHWC
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_reference_mha_leaks_across_batch_ours_does_not():
    """Documented divergence: the reference's single flattened softmax
    (archs.py:1043-1053) lets image 0's attention weights depend on image 1;
    this framework's per-batch einsum does not."""
    ref = _import_reference_archs()
    tm, jm, variables = _build_pair(ref, "SAME", num_heads=2)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    x2 = x.copy()
    x2[1] += rng.normal(size=(3, 8, 8)).astype(np.float32)

    with torch.no_grad():
        ref_a = tm(torch.from_numpy(x)).numpy()[0]
        ref_b = tm(torch.from_numpy(x2)).numpy()[0]
    assert np.abs(ref_a - ref_b).max() > 1e-6  # reference: batch leakage

    ours_a = np.asarray(jm.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False))[0]
    ours_b = np.asarray(jm.apply(variables, jnp.asarray(x2.transpose(0, 2, 3, 1)),
                                 train=False))[0]
    np.testing.assert_allclose(ours_a, ours_b, atol=1e-6)  # ours: independent
