#!/usr/bin/env python
"""Batch inference CLI — the deployment path: images in, masks out, no labels.

`val.py` mirrors the reference's evaluation loop (it scores against ground-truth
masks, reference val.py:84-107); this CLI serves a trained capsule on raw
images only:

    python infer.py --name dsb2018_96_NestedUNet_wDS --input_dir new_images/ \
        [--save_dir outputs] [--batch_size 16] [--refine true] [--threshold -1]

Loads the `models/<name>/{config.yml, model.msgpack}` capsule, resizes each
image to the capsule's input size, runs the jit-compiled predict function in
fixed-size batches (one compilation; short final batch is padded), writes one
mask per class — sigmoid probabilities x255 (reference val.py:100-105
convention) or hard 0/255 with `--threshold 0.5` — and prints a latency/
throughput summary (p50/p95 per batch, images/sec), since serving performance
is first-class here.

Optional `--refine true` post-processes each predicted mask through the
CascadePSP refinement stack (the capability the reference stubs at
train_ISIC_ca.py:183-189).
"""

import argparse
import glob
import os
import sys
import time

import cv2
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--name', required=True, help='capsule name (models/<name>)')
    p.add_argument('--input_dir', required=True, help='directory of images')
    p.add_argument('--img_ext', default=None,
                   help="glob extension (default: the capsule's img_ext)")
    p.add_argument('--output_dir', default='models')
    p.add_argument('--save_dir', default='outputs')
    p.add_argument('-b', '--batch_size', default=16, type=int)
    p.add_argument('--threshold', default=-1.0, type=float,
                   help='>=0: write hard 0/255 masks at this probability; '
                        'default writes sigmoid probabilities x255')
    p.add_argument('--full_res', default=False,
                   type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'),
                   help='resize predicted masks back to each image\'s '
                        'original resolution')
    p.add_argument('--refine', default=False,
                   type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'))
    p.add_argument('--refine_weights', default=None)
    p.add_argument('--refine_L', default=900, type=int)
    p.add_argument('--refine_fast', default=True,
                   type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'))
    p.add_argument('--platform', default='default')
    return vars(p.parse_args(argv))


def main(argv=None):
    args = parse_args(argv)
    from train import _configure_backend
    _configure_backend(args.get('platform', 'default'))

    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import checkpoint
    from pytorch_nested_unet_tpu.training.loop import make_predict_fn
    from pytorch_nested_unet_tpu.utils.config import load_config

    model_dir = os.path.join(args['output_dir'], args['name'])
    config = load_config(model_dir)
    size_hw = (config['input_h'], config['input_w'])

    ext = args['img_ext'] or config['img_ext']
    paths = sorted(glob.glob(os.path.join(args['input_dir'], f'*{ext}')))
    if not paths:
        sys.exit(f"no images found under {args['input_dir']} (*{ext})")

    dtype = jnp.bfloat16 if config.get('precision') == 'bf16' else None
    model = models.create_model(config['arch'], config['num_classes'],
                                config['input_channels'],
                                config['deep_supervision'], dtype=dtype)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, *size_hw, config['input_channels']),
                                    jnp.float32), train=True)
    variables = checkpoint.load_model(
        model_dir, {k: template[k] for k in ('params', 'batch_stats')})
    predict = make_predict_fn(model, config['deep_supervision'])

    refiner = None
    if args['refine']:
        from pytorch_nested_unet_tpu.refinement import Refiner
        refiner = Refiner(model_path=args['refine_weights'])

    ids, originals, batch_u8 = [], [], []
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            print(f'warning: unreadable image skipped: {p}')
            continue
        ids.append(os.path.splitext(os.path.basename(p))[0])
        originals.append(img.shape[:2])
        batch_u8.append(cv2.resize(img, (size_hw[1], size_hw[0])))
    images = np.stack(batch_u8)

    for c in range(config['num_classes']):
        os.makedirs(os.path.join(args['save_dir'], args['name'], str(c)),
                    exist_ok=True)

    B = args['batch_size']
    n = len(images)
    lat, written = [], 0
    for s in range(0, n, B):
        chunk = images[s:s + B]
        valid = len(chunk)
        if valid < B:  # pad: one compiled shape for every batch
            chunk = np.concatenate(
                [chunk, np.zeros((B - valid, *chunk.shape[1:]), chunk.dtype)])
        t0 = time.perf_counter()
        probs = predict(variables['params'], variables['batch_stats'],
                        jnp.asarray(chunk))
        probs = np.asarray(probs, np.float32)  # D2H barrier ends the timing
        lat.append(time.perf_counter() - t0)

        for i in range(valid):
            gid = ids[s + i]
            for c in range(config['num_classes']):
                m = probs[i, ..., c]
                if refiner is not None:
                    m = refiner.refine(chunk[i], (m * 255).astype(np.uint8),
                                       fast=args['refine_fast'],
                                       L=args['refine_L']).astype(np.float32) / 255
                if args['threshold'] >= 0:
                    m = (m >= args['threshold']).astype(np.float32)
                if args['full_res']:
                    h, w = originals[s + i]
                    m = cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR)
                cv2.imwrite(os.path.join(args['save_dir'], args['name'], str(c),
                                         f'{gid}.jpg'),
                            (m * 255).astype(np.uint8))
                written += 1

    lat_ms = sorted(t * 1e3 for t in lat)
    p50 = lat_ms[len(lat_ms) // 2]
    p95 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.95))]
    total = sum(lat)
    print(f'{written} masks -> {os.path.join(args["save_dir"], args["name"])}')
    print(f'batches {len(lat)} x {B}: p50 {p50:.1f} ms, p95 {p95:.1f} ms, '
          f'{n / total:.1f} img/s (first batch incl. compile '
          f'{lat_ms[-1] if len(lat) == 1 else lat[0] * 1e3:.0f} ms)')
    return written


if __name__ == '__main__':
    main()
