#!/usr/bin/env python
"""ISIC-2018 trainer with pixel-accuracy logging (reference trainISIC_wAcc.py).

Same as train_isic.py plus acc/val_acc log columns (the reference adds an `Acc`
AverageMeter and two csv columns, trainISIC_wAcc.py:114-151,339-368).
"""

import sys

import train
from train_isic import PRESET, _with_defaults


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    return train.main(_with_defaults(argv, {**PRESET, '--log_acc': 'true'}))


if __name__ == '__main__':
    main()
