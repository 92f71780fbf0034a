#!/usr/bin/env python
"""Plot training curves from a run's log.csv (reference Ploting.py CLI surface).

    python plot.py models/<name>/log.csv [--every 10] [--out_dir DIR]
"""

import argparse

from pytorch_nested_unet_tpu.utils.plotting import plot_data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", help="path to a run's log.csv")
    p.add_argument("--every", default=10, type=int,
                   help="sample every N epochs (reference samples every 10th)")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)
    for f in plot_data(args.path, every=args.every, out_dir=args.out_dir):
        print(f)


if __name__ == "__main__":
    main()
