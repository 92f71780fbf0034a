"""ctypes binding for the native C++ data loader (native/fastloader.cpp).

Gives the host input pipeline a GIL-free threaded decode+resize path — the
framework-native replacement for the reference's cv2 + DataLoader worker
processes (reference dataset.py:9-148, trains.py:291-302). Falls back to cv2
transparently when the shared library hasn't been built (native/build.sh) or
the platform lacks libpng/libjpeg.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libfastloader.so")
_lib = None
_tried = False


def _load_lib(auto_build: bool = True):
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB_PATH
    if not os.path.exists(path) and auto_build:
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["sh", build], capture_output=True, check=True,
                               timeout=120)
            except Exception:
                return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.nu_version.restype = ctypes.c_int
        lib.nu_load_batch.restype = ctypes.c_int
        lib.nu_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.nu_union_masks.restype = None
        lib.nu_union_masks.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        if lib.nu_version() >= 1:
            _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_batch(paths: Sequence[str], size_hw: Tuple[int, int], channels: int = 3,
               nearest: bool = False, num_threads: int = 0) -> np.ndarray:
    """Decode+resize a batch of PNG/JPEG files into (N, H, W, C) uint8.

    channels=3 -> BGR (cv2.imread parity); channels=1 -> grayscale.
    nearest=True uses INTER_NEAREST (masks); else INTER_LINEAR (images).
    Raises FileNotFoundError naming the first failing path.
    """
    lib = _load_lib()
    n = len(paths)
    h, w = int(size_hw[0]), int(size_hw[1])
    out = np.empty((n, h, w, channels), np.uint8)
    if lib is None:
        return _cv2_fallback(paths, out, nearest)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.nu_load_batch(arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                           h, w, channels, int(nearest), num_threads)
    if rc != 0:
        raise FileNotFoundError(f"native loader failed on {paths[rc - 1]}")
    return out


def _cv2_fallback(paths, out, nearest):
    import cv2

    n, h, w, c = out.shape
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE if c == 1 else cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(p)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h), interpolation=interp)
        out[i] = img[..., None] if c == 1 else img
    return out


def union_masks(masks: np.ndarray) -> np.ndarray:
    """Union per-instance masks (>127) into one binary mask*255 — the DSB2018
    preprocessing inner loop (reference preprocess_dsb2018.py:33-36)."""
    masks = np.ascontiguousarray(masks, np.uint8)
    n, h, w = masks.shape
    lib = _load_lib()
    if lib is None:
        return ((masks > 127).any(axis=0).astype(np.uint8) * 255)
    out = np.empty((h, w), np.uint8)
    lib.nu_union_masks(masks.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                       n, h * w,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out
