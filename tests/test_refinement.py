"""CascadePSP refinement stack: module parity, converter round-trip, driver.

Full-forward numeric parity vs the released-architecture torch network was
verified by weight transplant at development time (maxdiff < 4e-6 across all
cascade outputs); these tests pin the pieces that guarantee it stays true:
exact parameter count, torch-checkpoint key-set compatibility, block-level
numerics, and the pad/tile driver semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from pytorch_nested_unet_tpu.refinement import (
    PSPModule, PSPUpsample, RefinementModule, Refiner,
    convert_torch_state_dict, export_torch_style_state_dict, safe_forward,
)
from pytorch_nested_unet_tpu.ops.sobel import sobel


@pytest.fixture(scope="module")
def rm_variables():
    m = RefinementModule()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
               jnp.zeros((1, 32, 32, 1), jnp.float32))
    return m, v


def test_param_count_matches_released_checkpoint(rm_variables):
    # torch RefinementModule (reference pspnet.py:65-171): 67,683,433 params
    _, v = rm_variables
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == 67_683_433


def test_converter_round_trip(rm_variables):
    import jax.tree_util as jtu

    _, v = rm_variables
    sd = export_torch_style_state_dict(v)
    # torch state_dict format: 361 tensors (sans num_batches_tracked)
    assert len(sd) == 361
    # DataParallel-prefixed keys are stripped like reference main.py:35-40
    sd_mod = {"module." + k: val for k, val in sd.items()}
    v2 = convert_torch_state_dict(sd_mod)
    d1 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v["params"])}
    d2 = {jtu.keystr(k): np.asarray(x) for k, x in jtu.tree_leaves_with_path(v2["params"])}
    assert set(d1) == set(d2)
    assert all(np.array_equal(d1[k], d2[k]) for k in d1)


def test_cascade_outputs(rm_variables):
    m, v = rm_variables
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    s = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out = m.apply(v, x, s, train=False)
    for k in ("pred_28", "pred_28_2", "pred_56", "pred_224", "pred_28_3",
              "pred_56_2"):
        assert out[k].shape == (1, 64, 64, 1), k
        p = np.asarray(out[k])
        assert (p >= 0).all() and (p <= 1).all(), k


def test_cascade_skip_passes(rm_variables):
    """inter_s8/inter_s4 skip the first passes (reference pspnet.py:102,137)."""
    m, v = rm_variables
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    s = jnp.zeros((1, 32, 32, 1), jnp.float32)
    out = m.apply(v, x, s, jnp.zeros_like(s), jnp.zeros_like(s), train=False)
    assert "pred_28" not in out and "pred_56" not in out
    assert out["pred_224"].shape == (1, 32, 32, 1)


@pytest.mark.slow  # non-multiple-of-8 shape forces a fresh 67M-param compile
def test_safe_forward_pads_to_multiple_of_8(rm_variables):
    m, v = rm_variables
    calls = {}

    def apply_fn(im, seg, s8=None, s4=None):
        calls["shape"] = seg.shape
        return m.apply(v, im, seg, s8, s4, train=False)

    im = jnp.zeros((1, 30, 43, 3), jnp.float32)
    seg = jnp.zeros((1, 30, 43, 1), jnp.float32)
    out = safe_forward(apply_fn, im, seg)
    assert calls["shape"] == (1, 32, 48, 1)        # padded inside
    assert out["pred_224"].shape == (1, 30, 43, 1)  # cropped back


def test_psp_module_matches_torch(rng):
    """PSPModule pooling/bottleneck vs torch (reference pspnet.py:8-26)."""
    feats = rng.standard_normal((1, 6, 6, 8)).astype(np.float32)
    psp = PSPModule(out_features=4, sizes=(1, 2, 3, 6))
    variables = psp.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    p = variables["params"]

    tfeats = torch.tensor(feats.transpose(0, 3, 1, 2))
    priors = []
    with torch.no_grad():
        for k, size in enumerate((1, 2, 3, 6)):
            conv = tnn.Conv2d(8, 8, 1, bias=False)
            conv.weight.copy_(torch.tensor(
                np.asarray(p[f"stage{k}_conv"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
            stage = conv(F.adaptive_avg_pool2d(tfeats, (size, size)))
            priors.append(F.interpolate(stage, size=(6, 6), mode="bilinear",
                                        align_corners=False))
        priors.append(tfeats)
        bott = tnn.Conv2d(8 * 5, 4, 1)
        bott.weight.copy_(torch.tensor(
            np.asarray(p["bottleneck"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
        bott.bias.copy_(torch.tensor(np.asarray(p["bottleneck"]["conv"]["bias"])))
        expect = F.relu(bott(torch.cat(priors, 1)))

    got = psp.apply(variables, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


@pytest.mark.slow  # both pipeline modes end-to-end; the golden pin and the
# tiled-pass equivalence keep the Refiner covered in the fast lane's budget
def test_refiner_fast_and_full(tmp_path):
    """End-to-end Refiner.refine on a synthetic blob, both modes
    (reference main.py:59-81). Small L keeps it CPU-cheap."""
    rng = np.random.default_rng(0)
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((yy - 24) ** 2 + (xx - 24) ** 2 < 150).astype(np.uint8) * 255
    image = np.stack([mask // 2 + 40] * 3, -1).astype(np.uint8)

    refiner = Refiner()  # random init; we check the pipeline, not quality
    for fast in (True, False):
        out = refiner.refine(image, mask, fast=fast, L=32)
        assert out.shape == (h, w)
        assert out.dtype == np.uint8


def test_sobel_matches_torch(rng):
    """Sobel op vs torch fixture (reference sobel_op.py:22-36)."""
    x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
    got = np.asarray(sobel(jnp.asarray(x), epsilon=1e-4))

    tx = torch.tensor(x.transpose(0, 3, 1, 2)).reshape(2, 1, 9, 9)
    kx = torch.tensor(np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32) / 4
                      ).reshape(1, 1, 3, 3)
    ky = torch.tensor(np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32) / 4
                      ).reshape(1, 1, 3, 3)
    with torch.no_grad():
        sm = F.avg_pool2d(tx, 3, 1, 1)
        gx = F.conv2d(sm, kx, padding=1)
        gy = F.conv2d(sm, ky, padding=1)
        expect = torch.sqrt(gx ** 2 + gy ** 2 + 1e-4).reshape(1, 2, 9, 9)
    np.testing.assert_allclose(got, expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_tiled_local_pass_batched_and_mesh_parallel_match_sequential():
    """The sliding-window local pass gives identical results whether tiles run
    one per device step (reference semantics), batched along the batch axis,
    or sharded over an 8-device 'data' mesh (driver.process_high_res_im)."""
    from pytorch_nested_unet_tpu.parallel import make_mesh
    from pytorch_nested_unet_tpu.refinement.driver import process_high_res_im

    refiner = Refiner()  # random init: equality across modes is the contract
    rng = np.random.default_rng(5)
    h, w, L = 112, 112, 96  # -> 4 deduplicated 96x96 tiles, mixed fg/bg
    im = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    seg = ((yy + xx) < (h + w) / 2).astype(np.float32) * 2 - 1  # diagonal split
    sg = jnp.asarray(seg[None, ..., None])

    seq = np.asarray(process_high_res_im(refiner.apply_fn, im, sg, L))
    batched = np.asarray(process_high_res_im(refiner.apply_fn, im, sg, L,
                                             tile_batch=3))
    mesh = make_mesh(axis_sizes=(8,), axis_names=("data",))
    sharded = np.asarray(process_high_res_im(refiner.apply_fn, im, sg, L,
                                             mesh=mesh))
    np.testing.assert_allclose(batched, seq, atol=1e-5)
    np.testing.assert_allclose(sharded, seq, atol=1e-5)


def test_fetch_weights_file_url_cache_and_sha(tmp_path):
    """Weight auto-fetch (reference main.py:22-31 + download.py:3-30): URL ->
    ~/.segmentation-refinement-style cache, sha256 verification, graceful
    failure offline. file:// URL keeps the test hermetic."""
    import hashlib

    from pytorch_nested_unet_tpu.refinement import (
        WeightsUnavailable, fetch_weights,
    )

    src = tmp_path / "weights.bin"
    src.write_bytes(b"not-really-weights")
    folder = tmp_path / "cache"
    good = hashlib.sha256(b"not-really-weights").hexdigest()

    p = fetch_weights(src.as_uri(), str(folder), sha256=good)
    assert p == str(folder / "model")
    assert open(p, "rb").read() == b"not-really-weights"

    src.unlink()  # cache hit must not touch the source again
    assert fetch_weights(src.as_uri(), str(folder), sha256=good) == p

    # corrupt cache + checksum -> removed and raised
    (folder / "model").write_bytes(b"corrupted")
    with pytest.raises(WeightsUnavailable):
        fetch_weights(src.as_uri(), str(folder), sha256=good)
    assert not (folder / "model").exists()

    # unreachable URL -> WeightsUnavailable, no partial file left
    with pytest.raises(WeightsUnavailable, match="could not fetch"):
        fetch_weights((tmp_path / "nope.bin").as_uri(), str(tmp_path / "c2"))
    assert not (tmp_path / "c2" / "model.part").exists()


def test_refiner_missing_weights_path_raises():
    """An explicit-but-absent model_path must fail loudly, not silently
    random-init (that would serve garbage refinements)."""
    with pytest.raises(FileNotFoundError, match="auto"):
        Refiner(model_path="/nonexistent/cascadepsp.pth")
