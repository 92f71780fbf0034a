#!/usr/bin/env python
"""CA-Net trainer preset (reference train_Canet.py).

Reference deltas vs trains.py: batch size 2 (train_Canet.py:45), 256x256 inputs
(:59-61), ISIC data layout (.jpg/.png), no geometric/color augs. The reference
builds the model with zero args (train_Canet.py:236) — which its own
Comprehensive_Atten_Unet signature cannot satisfy; here the registry's uniform
(num_classes, input_channels, deep_supervision) contract is used, with CA-Net's
pooling parameterized by the input size (see models/canet.py docstring).
"""

import sys

import train
from train_isic import _with_defaults

PRESET = {
    '--dataset': 'ISIC',
    '--dataset_layout': 'isic',
    '--img_ext': '.jpg',
    '--mask_ext': '.png',
    '--augment': 'none',
    '--arch': 'Comprehensive_Atten_Unet',
    '--batch_size': '2',
    '--input_w': '256',
    '--input_h': '256',
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return train.main(_with_defaults(argv, PRESET))


if __name__ == '__main__':
    main()
