"""Offline DSB2018 preprocessing (reference preprocess_dsb2018.py:9-50).

Per stage1_train sample directory:
  - binary mask = union of all per-instance masks thresholded at >127
  - grayscale images tiled to 3 channels; RGBA stripped to 3
  - image and (float 0/1) mask resized to img_size x img_size with cv2 defaults
    (bilinear — so mask edges get intermediate values, which the loader later
    re-scales by /255; we keep that exact behavior)
  - written to <out>/dsb2018_<size>/{images, masks/0}/<id>.png
"""

import os
from glob import glob

import cv2
import numpy as np


def preprocess_dsb2018(src_dir: str, out_root: str = "inputs", img_size: int = 96,
                       verbose: bool = True):
    paths = sorted(glob(os.path.join(src_dir, "*")))
    out_img = os.path.join(out_root, f"dsb2018_{img_size}", "images")
    out_mask = os.path.join(out_root, f"dsb2018_{img_size}", "masks", "0")
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_mask, exist_ok=True)

    n = 0
    for path in paths:
        if not os.path.isdir(path):
            continue
        sample = os.path.basename(path)
        img_path = os.path.join(path, "images", sample + ".png")
        img = cv2.imread(img_path)
        if img is None:
            if verbose:
                print(f"skip {sample}: unreadable image")
            continue
        mask = np.zeros((img.shape[0], img.shape[1]))
        for mask_path in glob(os.path.join(path, "masks", "*")):
            m = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
            if m is not None:
                mask[m > 127] = 1
        if img.ndim == 2:
            img = np.tile(img[..., None], (1, 1, 3))
        if img.shape[2] == 4:
            img = img[..., :3]
        img = cv2.resize(img, (img_size, img_size))
        mask = cv2.resize(mask, (img_size, img_size))
        cv2.imwrite(os.path.join(out_img, sample + ".png"), img)
        cv2.imwrite(os.path.join(out_mask, sample + ".png"),
                    (mask * 255).astype("uint8"))
        n += 1
    if verbose:
        print(f"preprocessed {n} samples -> {os.path.dirname(out_img)}")
    return n
