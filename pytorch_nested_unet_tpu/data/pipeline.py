"""Input pipelines.

TPU-first design: DSB2018-scale datasets (hundreds of 96x96 images) fit in HBM
outright, so the default pipeline is **device-resident** — the whole uint8
dataset is device_put once, and every train step gathers its batch by index and
augments on device inside the jitted step. The host's only per-step work is an
index slice from a numpy permutation. This removes the reference's DataLoader
worker processes and per-step H2D copies (reference trains.py:114-115,291-302)
entirely.

For datasets that don't fit, `HostPrefetchLoader` streams batches with a
double-buffered background thread (the CPU-side analogue of the Pallas
double-buffering pattern).
"""

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class DeviceDataStore:
    """Whole dataset resident on device as uint8 arrays.

    With a mesh, arrays are replicated so any data-parallel gather is local.
    """

    def __init__(self, images_u8: np.ndarray, masks_u8: np.ndarray, mesh=None):
        assert images_u8.dtype == np.uint8 and masks_u8.dtype == np.uint8
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self.images = jax.device_put(images_u8, rep)
            self.masks = jax.device_put(masks_u8, rep)
        else:
            self.images = jax.device_put(images_u8)
            self.masks = jax.device_put(masks_u8)
        self.n = images_u8.shape[0]

    def __len__(self):
        return self.n


def epoch_batches(n: int, batch_size: int, rng: np.random.Generator,
                  shuffle: bool = True, drop_last: bool = True) -> Iterator[np.ndarray]:
    """Yield index arrays for one epoch (reference DataLoader semantics:
    shuffle+drop_last for train, neither for val, trains.py:291-302).

    For the non-drop_last case the final short batch is padded by repeating its
    last index so shapes stay static under jit; callers get (idx, valid_count).
    """
    order = rng.permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
        chunk = order[start:start + batch_size]
        if len(chunk) < batch_size:
            if drop_last:
                return
            pad = np.full(batch_size - len(chunk), chunk[-1], chunk.dtype)
            yield np.concatenate([chunk, pad]), len(chunk)
        else:
            yield chunk, batch_size


class HostPrefetchLoader:
    """Background-thread prefetcher for datasets too large to keep on device.

    Yields (images_u8, masks_u8, valid_count) numpy batches one step ahead of
    consumption.
    """

    def __init__(self, dataset, batch_size: int, size_hw: Tuple[int, int],
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 rng: Optional[np.random.Generator] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.size_hw = tuple(size_hw)
        self.shuffle = shuffle
        self.drop_last = drop_last
        # A shared Generator keeps the epoch shuffle identical to the
        # device-resident path at equal seeds (train.py --pipeline equivalence).
        self.rng = rng if rng is not None else np.random.default_rng(seed)
        self.prefetch = prefetch

    def _load_batch(self, idxs):
        import cv2

        imgs, msks = [], []
        for i in idxs:
            img, mask, _ = self.dataset.load_raw(int(i))
            h, w = self.size_hw
            if (img.shape[0], img.shape[1]) != self.size_hw:
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
                mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
                if mask.ndim == 2:
                    mask = mask[..., None]
            imgs.append(img)
            msks.append(mask)
        return np.stack(imgs), np.stack(msks)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            for idx, valid in epoch_batches(len(self.dataset), self.batch_size,
                                            self.rng, self.shuffle, self.drop_last):
                imgs, msks = self._load_batch(idx)
                q.put((imgs, msks, valid))
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
