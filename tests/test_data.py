"""Data layer: preprocessing semantics, loaders, split contract, augmentation."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nested_unet_tpu.data import (
    ISICDataset, SegmentationFolderDataset, augment, epoch_batches,
    list_image_ids, split_ids,
)
from pytorch_nested_unet_tpu.data.preprocess import preprocess_dsb2018


@pytest.fixture
def folder_ds(tmp_path, rng):
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks" / "0"
    img_dir.mkdir()
    mask_dir.mkdir(parents=True)
    for i in range(6):
        img = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
        mask = (rng.random((20, 24)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(img_dir / f"s{i}.png"), img)
        cv2.imwrite(str(mask_dir / f"s{i}.png"), mask)
    return tmp_path


def test_folder_dataset_and_resize(folder_ds):
    ids = list_image_ids(str(folder_ds / "images"), ".png")
    assert ids == [f"s{i}" for i in range(6)]
    ds = SegmentationFolderDataset(ids, str(folder_ds / "images"),
                                   str(folder_ds / "masks"), ".png", ".png", 1)
    img, mask, img_id = ds.load_raw(0)
    assert img.shape == (20, 24, 3) and mask.shape == (20, 24, 1)
    images, masks, out_ids = ds.load_all((16, 16))
    assert images.shape == (6, 16, 16, 3) and masks.shape == (6, 16, 16, 1)
    assert images.dtype == np.uint8
    # nearest-resized masks stay binary
    assert set(np.unique(masks)).issubset({0, 255})


def test_isic_mask_naming(tmp_path, rng):
    (tmp_path / "images").mkdir()
    (tmp_path / "mask").mkdir()
    img = rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "ISIC_1.jpg"), img)
    cv2.imwrite(str(tmp_path / "mask" / "ISIC_1_segmentation.png"),
                np.full((10, 10), 255, np.uint8))
    ds = ISICDataset(["ISIC_1"], str(tmp_path / "images"), str(tmp_path / "mask"),
                     ".jpg", ".png", 1)
    _, mask, _ = ds.load_raw(0)
    assert mask.min() == 255


def test_split_contract():
    ids = [f"id{i}" for i in range(100)]
    tr1, va1 = split_ids(ids)
    tr2, va2 = split_ids(ids)
    assert tr1 == tr2 and va1 == va2  # deterministic, seed 41
    assert len(va1) == 20
    assert set(tr1) | set(va1) == set(ids)


def test_preprocess_dsb2018(tmp_path, rng):
    # build two fake stage1_train samples: one RGBA image, one grayscale
    for k, mode in enumerate(["rgba", "gray"]):
        s = tmp_path / "stage1_train" / f"sample{k}"
        (s / "images").mkdir(parents=True)
        (s / "masks").mkdir()
        if mode == "rgba":
            img = rng.integers(0, 255, (30, 30, 4), dtype=np.uint8)
        else:
            img = rng.integers(0, 255, (30, 30), dtype=np.uint8)
        cv2.imwrite(str(s / "images" / f"sample{k}.png"), img)
        for j in range(2):  # two instance masks to union
            m = np.zeros((30, 30), np.uint8)
            m[5 * j: 5 * j + 5, :] = 200
            cv2.imwrite(str(s / "masks" / f"m{j}.png"), m)
    n = preprocess_dsb2018(str(tmp_path / "stage1_train"),
                           str(tmp_path / "out"), img_size=16, verbose=False)
    assert n == 2
    for k in range(2):
        img = cv2.imread(str(tmp_path / "out" / "dsb2018_16" / "images" / f"sample{k}.png"))
        mask = cv2.imread(str(tmp_path / "out" / "dsb2018_16" / "masks" / "0" / f"sample{k}.png"),
                          cv2.IMREAD_GRAYSCALE)
        assert img.shape == (16, 16, 3)
        assert mask.shape == (16, 16) and mask.max() == 255


def test_epoch_batches_padding():
    rng = np.random.default_rng(0)
    batches = list(epoch_batches(10, 4, rng, shuffle=False, drop_last=False))
    assert [v for _, v in batches] == [4, 4, 2]
    assert all(len(i) == 4 for i, _ in batches)
    # drop_last drops the short one and shuffles
    batches = list(epoch_batches(10, 4, rng, shuffle=True, drop_last=True))
    assert [v for _, v in batches] == [4, 4]


def test_normalize_formula():
    img = jnp.full((4, 4, 3), 0.5, jnp.float32)
    out = np.asarray(augment.normalize(img))
    mean = np.array(augment.IMAGENET_MEAN)
    std = np.array(augment.IMAGENET_STD)
    expected = ((0.5 - mean) / std) / 255.0
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_hsv_roundtrip(rng):
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    h, s, v = augment.rgb_to_hsv(img)
    back = augment.hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_augment_batch_geometry_preserves_mask_binarity(rng):
    imgs = rng.integers(0, 255, (8, 12, 12, 3), dtype=np.uint8)
    masks = (rng.random((8, 12, 12, 1)) > 0.5).astype(np.uint8) * 255
    out_img, out_mask = augment.augment_batch(jax.random.PRNGKey(3),
                                              jnp.asarray(imgs), jnp.asarray(masks),
                                              train=True)
    assert out_img.shape == (8, 12, 12, 3)
    m = np.asarray(out_mask)
    assert set(np.unique(m)).issubset({0.0, 1.0})  # rot/flip only move pixels
    # pixel mass preserved per image by pure geometric ops on the mask
    np.testing.assert_allclose(m.sum(axis=(1, 2, 3)),
                               (masks / 255).sum(axis=(1, 2, 3)))


def test_augment_eval_is_deterministic(rng):
    imgs = rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
    masks = (rng.random((4, 8, 8, 1)) > 0.5).astype(np.uint8) * 255
    a1 = augment.eval_transform(jnp.asarray(imgs), jnp.asarray(masks))
    a2 = augment.eval_transform(jnp.asarray(imgs), jnp.asarray(masks))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))


def test_rect_rot90_static_shape(rng):
    # non-square images: rot90 must keep static (h, w) via resample-back
    imgs = rng.integers(0, 255, (4, 10, 16, 3), dtype=np.uint8)
    masks = (rng.random((4, 10, 16, 1)) > 0.5).astype(np.uint8) * 255
    out_img, out_mask = augment.augment_batch(jax.random.PRNGKey(0),
                                              jnp.asarray(imgs), jnp.asarray(masks),
                                              train=True)
    assert out_img.shape == (4, 10, 16, 3) and out_mask.shape == (4, 10, 16, 1)


def test_parse_augment_spec():
    full = augment.AUGMENT_OPS
    assert augment.parse_augment_spec("full") == full
    assert augment.parse_augment_spec(True) == full
    assert augment.parse_augment_spec("none") == ()
    assert augment.parse_augment_spec(False) == ()
    assert augment.parse_augment_spec(None) == ()
    # comma list, any order/spacing/dupes -> canonical deduped tuple
    assert augment.parse_augment_spec("flip, rot90,flip") == ("rot90", "flip")
    assert augment.parse_augment_spec(("contrast", "hsv")) == ("hsv", "contrast")
    with pytest.raises(ValueError, match="bogus"):
        augment.parse_augment_spec("flip,bogus")


def test_augment_op_subsets(rng):
    imgs = rng.integers(0, 255, (6, 12, 12, 3), dtype=np.uint8)
    masks = (rng.random((6, 12, 12, 1)) > 0.5).astype(np.uint8) * 255
    j_imgs, j_masks = jnp.asarray(imgs), jnp.asarray(masks)
    key = jax.random.PRNGKey(5)

    # empty spec == eval transform (up to jit vs eager rounding)
    out_img, out_mask = augment.augment_batch(key, j_imgs, j_masks, train=())
    ev_img, ev_mask = augment.eval_transform(j_imgs, j_masks)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(ev_img), atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ev_mask))

    # flip-only: every image equals one of the 4 flip variants of the
    # normalized original; masks move identically (no color op applied)
    out_img, out_mask = augment.augment_batch(key, j_imgs, j_masks,
                                              train=("flip",))
    oi, om = np.asarray(out_img), np.asarray(out_mask)
    for b in range(6):
        variants = [np.asarray(ev_img)[b], np.asarray(ev_img)[b][::-1],
                    np.asarray(ev_img)[b][:, ::-1], np.asarray(ev_img)[b][::-1, ::-1]]
        matches = [np.allclose(oi[b], v, atol=1e-6) for v in variants]
        assert any(matches), f"image {b} is not a pure flip"
        mvariants = [np.asarray(ev_mask)[b], np.asarray(ev_mask)[b][::-1],
                     np.asarray(ev_mask)[b][:, ::-1], np.asarray(ev_mask)[b][::-1, ::-1]]
        assert np.allclose(om[b], mvariants[matches.index(True)])

    # brightness-only: geometry untouched (mask unchanged), and the image is
    # the normalized clip(x+beta) for a per-image constant beta
    out_img, out_mask = augment.augment_batch(key, j_imgs, j_masks,
                                              train=("brightness",))
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(ev_mask))
    x = imgs.astype(np.float32) / 255.0
    mean = np.asarray(augment.IMAGENET_MEAN, np.float32)
    std = np.asarray(augment.IMAGENET_STD, np.float32)
    recovered = np.asarray(out_img) * 255.0 * std + mean  # undo normalize
    interior = (recovered > 1e-5) & (recovered < 1 - 1e-5)  # unclipped pixels
    beta = recovered - x
    for b in range(6):
        vals = beta[b][interior[b]]
        assert vals.size and np.ptp(vals) < 1e-4, "beta is not constant"
