"""Folder datasets mirroring the reference layouts (reference dataset.py:9-148).

Two layouts:
  - Generic per-class: images/<id><img_ext> + masks/<c>/<id><mask_ext>
    (reference Dataset, dataset.py:9-76)
  - ISIC: images/<id><img_ext> + mask/<id>_segmentation<mask_ext> in one flat dir
    (reference ISIC_Dataset, dataset.py:79-148)

Images are loaded with cv2 (BGR, like the reference) as uint8. `load_all` resizes
everything to the training size once on the host — images with INTER_LINEAR and
masks with INTER_NEAREST, exactly what albumentations Resize does — so the device
pipeline never touches variable shapes.
"""

import os
from glob import glob
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


def list_image_ids(img_dir: str, img_ext: str) -> List[str]:
    """Glob image ids. Sorted for determinism (the reference relies on raw
    glob order, reference trains.py:252-253, which is filesystem-dependent)."""
    paths = glob(os.path.join(img_dir, "*" + img_ext))
    return sorted(os.path.splitext(os.path.basename(p))[0] for p in paths)


def split_ids(img_ids: Sequence[str], test_size: float = 0.2, seed: int = 41):
    """80/20 split with sklearn's seed-41 shuffle — the reference's
    reproducibility contract (reference trains.py:255, val.py:56)."""
    from sklearn.model_selection import train_test_split

    return train_test_split(list(img_ids), test_size=test_size, random_state=seed)


class SegmentationFolderDataset:
    """Generic per-class-mask dataset (reference dataset.py:9-76)."""

    def __init__(self, img_ids, img_dir, mask_dir, img_ext, mask_ext, num_classes):
        self.img_ids = list(img_ids)
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.img_ext = img_ext
        self.mask_ext = mask_ext
        self.num_classes = num_classes

    def __len__(self):
        return len(self.img_ids)

    def _mask_path(self, img_id: str, cls: int) -> str:
        return os.path.join(self.mask_dir, str(cls), img_id + self.mask_ext)

    def load_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        """Returns (image HWC uint8 BGR, mask HW<num_classes> uint8, img_id)."""
        img_id = self.img_ids[idx]
        img = cv2.imread(os.path.join(self.img_dir, img_id + self.img_ext))
        if img is None:
            raise FileNotFoundError(os.path.join(self.img_dir, img_id + self.img_ext))
        mask = []
        for c in range(self.num_classes):
            m = cv2.imread(self._mask_path(img_id, c), cv2.IMREAD_GRAYSCALE)
            if m is None:
                raise FileNotFoundError(self._mask_path(img_id, c))
            mask.append(m[..., None])
        return img, np.dstack(mask), img_id

    def load_all(self, size_hw: Optional[Tuple[int, int]] = None,
                 use_native: bool = True):
        """Load + host-resize the whole dataset -> (images, masks, ids) uint8 arrays.

        With use_native (default), decoding/resizing runs through the C++
        thread-pool loader (native/fastloader.cpp; GIL-free libpng/libjpeg +
        cv2-parity resize), falling back to cv2 per-file otherwise.
        """
        if size_hw is not None and use_native:
            from . import native

            if native.native_available():
                img_paths = [os.path.join(self.img_dir, i + self.img_ext)
                             for i in self.img_ids]
                images = native.load_batch(img_paths, size_hw, channels=3)
                per_class = [
                    native.load_batch([self._mask_path(i, c) for i in self.img_ids],
                                      size_hw, channels=1, nearest=True)
                    for c in range(self.num_classes)
                ]
                masks = np.concatenate(per_class, axis=-1)
                return images, masks, list(self.img_ids)

        images, masks = [], []
        for i in range(len(self)):
            img, mask, _ = self.load_raw(i)
            if size_hw is not None and (img.shape[0], img.shape[1]) != tuple(size_hw):
                h, w = size_hw
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
                mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
                if mask.ndim == 2:
                    mask = mask[..., None]
            images.append(img)
            masks.append(mask)
        return np.stack(images), np.stack(masks), list(self.img_ids)


class ISICDataset(SegmentationFolderDataset):
    """ISIC-2018 layout: flat mask dir, `<id>_segmentation` naming
    (reference dataset.py:131-133)."""

    def _mask_path(self, img_id: str, cls: int) -> str:
        return os.path.join(self.mask_dir, img_id + "_segmentation" + self.mask_ext)


DATASET_CLASSES = {
    "generic": SegmentationFolderDataset,
    "isic": ISICDataset,
}
