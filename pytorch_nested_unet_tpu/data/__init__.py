"""Data layer: offline preprocessing, folder datasets, on-device augmentation,
and device-resident / host-streaming input pipelines."""

from .datasets import SegmentationFolderDataset, ISICDataset, list_image_ids, split_ids
from .pipeline import DeviceDataStore, HostPrefetchLoader, epoch_batches
from . import augment, native, preprocess

__all__ = [
    "SegmentationFolderDataset", "ISICDataset", "list_image_ids", "split_ids",
    "DeviceDataStore", "HostPrefetchLoader", "epoch_batches",
    "augment", "native", "preprocess",
]
