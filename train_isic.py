#!/usr/bin/env python
"""ISIC-2018 trainer preset (reference train_ISIC.py).

Delegates to train.py with the reference script's defaults: ISIC dataset layout
(physical inputs/ISIC/{train,test}/{image,mask} dirs, `<id>_segmentation` mask
naming, train_ISIC.py:268-308), .jpg images / .png masks (train_ISIC.py:73-75),
and augmentation reduced to Resize+Normalize (the geometric/color augs are
commented out in the reference, train_ISIC.py:282-296).

Any explicit flag overrides the preset (e.g. --arch UNet --epochs 10).
"""

import sys

import train


def _with_defaults(argv, defaults):
    given = {a.split('=')[0] for a in argv if a.startswith('--')}
    out = list(argv)
    for flag, value in defaults.items():
        if flag not in given:
            out += [flag, value]
    return out


PRESET = {
    '--dataset': 'ISIC',
    '--dataset_layout': 'isic',
    '--img_ext': '.jpg',
    '--mask_ext': '.png',
    '--augment': 'none',
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return train.main(_with_defaults(argv, PRESET))


if __name__ == '__main__':
    main()
