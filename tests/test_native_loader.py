"""Native C++ data loader (native/fastloader.cpp via ctypes): cv2 parity."""

import os

import cv2
import numpy as np
import pytest

from pytorch_nested_unet_tpu.data import native


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img_paths, mask_paths = [], []
    for i in range(4):
        img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
        p_png = str(d / f"i{i}.png")
        p_jpg = str(d / f"i{i}.jpg")
        cv2.imwrite(p_png, img)
        cv2.imwrite(p_jpg, img)
        img_paths += [p_png, p_jpg]
        m = (rng.random((37, 53)) > 0.5).astype(np.uint8) * 255
        mp = str(d / f"m{i}.png")
        cv2.imwrite(mp, m)
        mask_paths.append(mp)
    return img_paths, mask_paths


needs_native = pytest.mark.skipif(not native.native_available(),
                                  reason="libfastloader.so not built")


@needs_native
def test_images_match_cv2_within_1lsb(image_files):
    img_paths, _ = image_files
    nat = native.load_batch(img_paths, (24, 32), channels=3)
    ref = native._cv2_fallback(img_paths, np.empty_like(nat), False)
    assert int(np.abs(nat.astype(int) - ref.astype(int)).max()) <= 1


@needs_native
def test_masks_match_cv2_exactly(image_files):
    _, mask_paths = image_files
    nat = native.load_batch(mask_paths, (24, 32), channels=1, nearest=True)
    ref = native._cv2_fallback(mask_paths, np.empty_like(nat), True)
    assert np.array_equal(nat, ref)


@needs_native
def test_no_resize_is_bit_exact(image_files):
    img_paths, _ = image_files
    nat = native.load_batch(img_paths[:2], (37, 53), channels=3)
    ref = native._cv2_fallback(img_paths[:2], np.empty((2, 37, 53, 3), np.uint8), False)
    assert np.array_equal(nat, ref)


@needs_native
def test_missing_file_reports_path(image_files, tmp_path):
    img_paths, _ = image_files
    bad = str(tmp_path / "missing.png")
    with pytest.raises(FileNotFoundError, match="missing.png"):
        native.load_batch([img_paths[0], bad], (16, 16))


def test_union_masks_semantics(rng):
    ms = rng.integers(0, 255, (5, 16, 16), dtype=np.uint8)
    expect = (ms > 127).any(axis=0).astype(np.uint8) * 255
    assert np.array_equal(native.union_masks(ms), expect)


@needs_native
def test_dataset_load_all_uses_native(tmp_path, rng):
    from pytorch_nested_unet_tpu.data import SegmentationFolderDataset

    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks" / "0"
    img_dir.mkdir()
    mask_dir.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"a{i}.png"),
                    rng.integers(0, 255, (20, 20, 3), dtype=np.uint8))
        cv2.imwrite(str(mask_dir / f"a{i}.png"),
                    (rng.random((20, 20)) > 0.5).astype(np.uint8) * 255)
    ds = SegmentationFolderDataset([f"a{i}" for i in range(3)], str(img_dir),
                                   str(tmp_path / "masks"), ".png", ".png", 1)
    imgs_n, masks_n, ids = ds.load_all((16, 16), use_native=True)
    imgs_c, masks_c, _ = ds.load_all((16, 16), use_native=False)
    assert imgs_n.shape == (3, 16, 16, 3) and masks_n.shape == (3, 16, 16, 1)
    assert int(np.abs(imgs_n.astype(int) - imgs_c.astype(int)).max()) <= 1
    assert np.array_equal(masks_n, masks_c)
