"""Golden-output regression pin for the FULL Refiner pipeline.

Mirror of the reference's de-facto golden test
(/root/reference/segmentation-refinement/test.py:1-19, which diffs the
checked-in test/aeroplane_output*.png): a fixed synthetic image+mask through
the deterministic random-init Refiner (PRNGKey(0)), compared against a
checked-in uint8 golden for BOTH the fast single-pass and the full 3-pass
cascade + tiled driver. A cross-round numeric drift anywhere in the stack
(module wiring, resize, Sobel, tile geometry, converter defaults) fails here
at a glance.

Regenerate after an INTENDED numeric change:
    GOLDEN_REGEN=1 python -m pytest tests/test_refinement_golden.py -q
then review + commit the new tests/golden/*.npy with the change that caused it.

Tolerance: uint8 outputs must match the golden within 1 gray level everywhere
and exactly on >=99% of pixels — slack for last-ulp float differences from
XLA/flax version drift, far below any semantic change.
"""

import os

import numpy as np

from pytorch_nested_unet_tpu.refinement import Refiner

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _scene():
    """Deterministic 48x48 scene: a blob mask, a textured image with an
    intensity edge offset from the mask boundary (so refinement has a real
    gradient signal to move toward)."""
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (((yy - 24) ** 2 + (xx - 24) ** 2) < 150).astype(np.uint8) * 255
    edge = (((yy - 26) ** 2 + (xx - 22) ** 2) < 180).astype(np.uint8)
    rng = np.random.default_rng(7)
    tex = rng.integers(0, 30, (h, w), dtype=np.uint8)
    image = np.stack([edge * 120 + 40 + tex,
                      edge * 90 + 60 + tex,
                      edge * 60 + 80 + tex], -1).astype(np.uint8)
    return image, mask


def _check(name, out):
    path = os.path.join(_GOLDEN_DIR, name)
    if os.environ.get("GOLDEN_REGEN"):
        os.makedirs(_GOLDEN_DIR, exist_ok=True)
        np.save(path, out)
        return
    golden = np.load(path)
    assert out.shape == golden.shape and out.dtype == golden.dtype
    diff = np.abs(out.astype(np.int16) - golden.astype(np.int16))
    assert diff.max() <= 1, f"{name}: max gray-level diff {diff.max()}"
    frac_exact = float((diff == 0).mean())
    assert frac_exact >= 0.99, f"{name}: only {frac_exact:.4f} pixels exact"


def test_refiner_fast_golden():
    image, mask = _scene()
    out = Refiner().refine(image, mask, fast=True, L=32)
    _check("refiner_fast_L32.npy", out)


def test_refiner_full_golden():
    image, mask = _scene()
    out = Refiner().refine(image, mask, fast=False, L=32)
    _check("refiner_full_L32.npy", out)
