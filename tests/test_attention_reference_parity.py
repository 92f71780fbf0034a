"""Forward parity against the reference's OWN AttU_Net / R2AttU_Net code.

Runtime-imports /root/reference/archs.py (never vendored) with a stub for its
unused module-level `import fastai.vision` (archs.py:21 — fastai is only
needed by the dead DoubleUnet code, archs.py:1080-1239), builds the reference
models on CPU, and checks that converting their state_dicts through
utils/torch_convert.convert_attention_unet_state_dict reproduces the full
forward pass in this framework — the strongest per-arch evidence available
for the attention family (reference archs.py:1322-1474).
"""

import importlib.util
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.utils.torch_convert import (
    convert_attention_unet_state_dict, export_attention_unet_state_dict,
)

REF = os.environ.get("REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "archs.py")),
    reason="no reference checkout")


def _import_reference_archs():
    """Import archs.py from file with fastai stubbed (module-level import of a
    package this environment doesn't ship; unused by the live classes)."""
    stubbed = []
    for name in ("fastai", "fastai.vision"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # archs.py:1180 evaluates `fv.create_body(Callable)` as a default
            # argument at class-definition time (dead DoubleUnet code) — the
            # stub only needs the call to not raise.
            mod.create_body = lambda *a, **k: None
            sys.modules[name] = mod
            stubbed.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_archs_attn", os.path.join(REF, "archs.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for name in stubbed:
            sys.modules.pop(name, None)


def _randomize_bn(tm, seed=1):
    nprng = np.random.default_rng(seed)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                for t, lo, hi in ((m.weight, 0.5, 1.5), (m.bias, -0.2, 0.2),
                                  (m.running_mean, -0.1, 0.1),
                                  (m.running_var, 0.8, 1.2)):
                    t.copy_(torch.tensor(nprng.uniform(lo, hi, t.shape),
                                         dtype=torch.float32))


@pytest.mark.parametrize("arch", ["AttU_Net", "R2AttU_Net"])
def test_reference_attention_forward_parity(arch, rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = getattr(ref, arch)(img_ch=3, output_ch=1).eval()
    _randomize_bn(tm)

    variables = convert_attention_unet_state_dict(tm.state_dict())
    jm = models.create_model(arch, 1, 3, False)

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = jm.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expect, atol=5e-5)


@pytest.mark.parametrize("arch", ["AttU_Net", "R2AttU_Net"])
def test_attention_export_loads_into_reference(arch, rng):
    ref = _import_reference_archs()
    torch.manual_seed(0)
    tm = getattr(ref, arch)(img_ch=3, output_ch=1).eval()
    _randomize_bn(tm)

    variables = convert_attention_unet_state_dict(tm.state_dict())
    sd = export_attention_unet_state_dict(variables)
    torch_keys = {k for k in tm.state_dict() if "num_batches_tracked" not in k}
    assert set(sd) == torch_keys

    tm2 = getattr(ref, arch)(img_ch=3, output_ch=1).eval()
    missing, unexpected = tm2.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in k for k in missing)

    x = torch.tensor(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(tm(x).numpy(), tm2(x).numpy(), atol=0)
