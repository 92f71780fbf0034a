#!/usr/bin/env python
"""Offline DSB2018 preprocessing CLI (reference preprocess_dsb2018.py:9-50)."""

import argparse

from pytorch_nested_unet_tpu.data.preprocess import preprocess_dsb2018


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--src', default='inputs/data-science-bowl-2018/stage1_train',
                        help='stage1_train directory with per-sample subdirs')
    parser.add_argument('--out', default='inputs', help='output root')
    parser.add_argument('--img_size', default=96, type=int)
    args = parser.parse_args()
    preprocess_dsb2018(args.src, args.out, args.img_size)


if __name__ == '__main__':
    main()
