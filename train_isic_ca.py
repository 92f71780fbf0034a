#!/usr/bin/env python
"""ISIC trainer with the CascadePSP refinement hook (reference train_ISIC_ca.py).

The reference imports segmentation_refinement + cascadePSP_model and stubs a
Refiner call in validate (train_ISIC_ca.py:33-36,183-189 — commented out).
Here the capability is live: training matches train_isic.py, and refinement is
applied at evaluation via `val.py --refine [--refine_weights <cascadepsp.pth>]`
or by choosing the in-model hybrids (--arch UNetRNNPSP / UNetRNNCAttention_PSP).
"""

import sys

import train
from train_isic import PRESET, _with_defaults


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return train.main(_with_defaults(argv, PRESET))


if __name__ == '__main__':
    main()
