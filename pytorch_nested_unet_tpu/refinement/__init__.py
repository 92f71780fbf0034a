"""CascadePSP segmentation refinement (reference segmentation-refinement/ and
cascadePSP_model/, SURVEY.md §2.6) — TPU-native single implementation.

SyncBN note: the reference vendors the network twice (plain-BN and
SynchronizedBatchNorm for thread-based multi-GPU). Here one flax module covers
both — under pjit/GSPMD the BN moment reductions are global across the mesh's
batch axis (XLA emits the ICI all-reduce), which IS synchronized BN.
"""

from .pspnet import (
    DilatedBottleneck, DilatedResNet50, PSPModule, PSPNet, PSPUpsample,
    RefinementModule,
)
from .driver import (
    process_high_res_im, process_im_single_pass, resize_max_side, safe_forward,
)
from .refiner import (
    Refiner, WeightsUnavailable, convert_torch_state_dict,
    export_torch_style_state_dict, fetch_weights,
)

__all__ = [
    "RefinementModule", "PSPNet", "PSPModule", "PSPUpsample",
    "DilatedResNet50", "DilatedBottleneck",
    "process_high_res_im", "process_im_single_pass", "resize_max_side",
    "safe_forward",
    "Refiner", "convert_torch_state_dict", "export_torch_style_state_dict",
    "fetch_weights", "WeightsUnavailable",
]
