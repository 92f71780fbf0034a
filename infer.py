#!/usr/bin/env python
"""Batch inference CLI — the deployment path: images in, masks out, no labels.

`val.py` mirrors the reference's evaluation loop (it scores against ground-truth
masks, reference val.py:84-107); this CLI serves a trained capsule on raw
images only:

    python infer.py --name dsb2018_96_NestedUNet_wDS --input_dir new_images/ \
        [--save_dir outputs] [--batch_size 16] [--refine true] [--threshold 0.5]

Loads the `models/<name>/{config.yml, model.msgpack}` capsule, streams the
directory in fixed-size batches (decode/resize per batch — memory stays
bounded by one batch; one jit compilation since short batches are padded),
writes one mask per class — sigmoid probabilities x255 (reference
val.py:100-105 convention) or hard 0/255 with `--threshold 0.5` — and prints a
latency/throughput summary (steady-state p50/p95 per batch, images/sec), since
serving performance is first-class here.

Optional `--refine true` post-processes each predicted mask through the
CascadePSP refinement stack (the capability the reference stubs at
train_ISIC_ca.py:183-189).

`--artifact path.jaxexport` serves an AOT-exported StableHLO artifact
(see export.py) instead of a capsule — no model code, registry, or
checkpoint loading on the serving host.
"""

import argparse
import glob
import os
import sys
import time

import cv2
import numpy as np

from pytorch_nested_unet_tpu.utils import str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--name', default=None, help='capsule name (models/<name>)')
    p.add_argument('--artifact', default=None,
                   help='serve from an AOT-exported .jaxexport artifact '
                        '(export.py) instead of a capsule — no model code or '
                        'checkpoint loading; supersedes --name/--output_dir/'
                        '--precision')
    p.add_argument('--input_dir', required=True, help='directory of images')
    p.add_argument('--img_ext', default=None,
                   help="glob extension (default: the capsule's img_ext)")
    p.add_argument('--output_dir', default='models')
    p.add_argument('--save_dir', default='outputs')
    p.add_argument('-b', '--batch_size', default=16, type=int)
    p.add_argument('--threshold', default=-1.0, type=float,
                   help='>=0: write hard 0/255 masks at this probability '
                        '(applied after any --full_res resize so the output '
                        'is truly binary); default writes sigmoid '
                        'probabilities x255')
    p.add_argument('--full_res', default=False, type=str2bool,
                   help="resize predicted masks back to each image's "
                        "original resolution")
    p.add_argument('--out_ext', default='.png', choices=['.png', '.jpg'],
                   help="output mask format. '.png' (default) is lossless — "
                        "thresholded masks stay truly binary and probability "
                        "masks keep 8-bit precision; '.jpg' matches the "
                        "reference's val.py output convention (reference "
                        "val.py:100-105) at the cost of ringing artifacts")
    p.add_argument('--refine', default=False, type=str2bool)
    p.add_argument('--refine_weights', default=None)
    p.add_argument('--refine_L', default=900, type=int)
    p.add_argument('--refine_fast', default=True, type=str2bool)
    p.add_argument('--refine_tile_batch', default=None, type=int,
                   help='batch k sliding-window tiles per device dispatch in '
                        'the full refinement pipeline')
    p.add_argument('--platform', default='default')
    p.add_argument('--precision', default=None, choices=['bf16', 'fp32'],
                   help="serving compute precision override (default: the "
                        "capsule's training precision) — bf16 halves "
                        "activation traffic on TPU; params stay f32")
    return vars(p.parse_args(argv))


def main(argv=None):
    args = parse_args(argv)
    from pytorch_nested_unet_tpu.utils.backend import configure_backend
    configure_backend(args.get('platform', 'default'))

    if args['artifact']:
        from pytorch_nested_unet_tpu.serving import load_exported

        predict_u8, config = load_exported(args['artifact'])
        args['name'] = args['name'] or config.get('name') or \
            os.path.splitext(os.path.basename(args['artifact']))[0]
        if config.get('batch') not in (None, 'dynamic') and \
                args['batch_size'] != config['batch']:
            print(f"artifact pins batch={config['batch']}; "
                  f"overriding --batch_size {args['batch_size']}")
            args['batch_size'] = int(config['batch'])

        def predict_batch(chunk):
            return predict_u8(chunk)
    elif not args['name']:
        sys.exit('one of --name or --artifact is required')
    else:
        import jax.numpy as jnp

        from pytorch_nested_unet_tpu.training import checkpoint
        from pytorch_nested_unet_tpu.training.loop import make_predict_fn

        model_dir = os.path.join(args['output_dir'], args['name'])
        dtype = {None: None, 'bf16': jnp.bfloat16,
                 'fp32': False}[args['precision']]
        model, variables, config = checkpoint.load_capsule(model_dir,
                                                           dtype=dtype)
        predict = make_predict_fn(model, config['deep_supervision'])

        def predict_batch(chunk):
            return predict(variables['params'], variables['batch_stats'],
                           jnp.asarray(chunk))

    size_hw = (config['input_h'], config['input_w'])

    ext = args['img_ext'] or config.get('img_ext', '.png')
    paths = sorted(glob.glob(os.path.join(args['input_dir'], f'*{ext}')))
    if not paths:
        sys.exit(f"no images found under {args['input_dir']} (*{ext})")

    refiner = None
    if args['refine']:
        from pytorch_nested_unet_tpu.refinement import Refiner
        refiner = Refiner(model_path=args['refine_weights'],
                          tile_batch=args.get('refine_tile_batch'))

    for c in range(config['num_classes']):
        os.makedirs(os.path.join(args['save_dir'], args['name'], str(c)),
                    exist_ok=True)

    B = args['batch_size']
    lat, written, unreadable = [], 0, 0
    for s in range(0, len(paths), B):
        ids, originals, chunk_list = [], [], []
        for p in paths[s:s + B]:  # stream: decode/resize one batch at a time
            img = cv2.imread(p)
            if img is None:
                print(f'warning: unreadable image skipped: {p}')
                unreadable += 1
                continue
            ids.append(os.path.splitext(os.path.basename(p))[0])
            originals.append(img.shape[:2])
            chunk_list.append(cv2.resize(img, (size_hw[1], size_hw[0])))
        if not chunk_list:
            continue
        valid = len(chunk_list)
        chunk = np.stack(chunk_list)
        if valid < B:  # pad: one compiled shape for every batch
            chunk = np.concatenate(
                [chunk, np.zeros((B - valid, *chunk.shape[1:]), chunk.dtype)])

        t0 = time.perf_counter()
        probs = predict_batch(chunk)
        probs = np.asarray(probs, np.float32)  # D2H barrier ends the timing
        lat.append(time.perf_counter() - t0)

        for i in range(valid):
            for c in range(config['num_classes']):
                m = probs[i, ..., c]
                if refiner is not None:
                    m = refiner.refine(chunk[i], (m * 255).astype(np.uint8),
                                       fast=args['refine_fast'],
                                       L=args['refine_L']).astype(np.float32) / 255
                if args['full_res']:
                    h, w = originals[i]
                    m = cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR)
                if args['threshold'] >= 0:  # after resize: truly binary output
                    m = (m >= args['threshold']).astype(np.float32)
                cv2.imwrite(os.path.join(args['save_dir'], args['name'], str(c),
                                         ids[i] + args['out_ext']),
                            (m * 255).astype(np.uint8))
                written += 1

    if not lat:
        sys.exit(f"no readable images among the {unreadable} matched under "
                 f"{args['input_dir']}")
    # steady-state distribution: the first batch pays the compile; report it
    # separately instead of letting it dominate p95
    steady = sorted(t * 1e3 for t in (lat[1:] if len(lat) > 1 else lat))
    p50 = steady[len(steady) // 2]
    p95 = steady[min(len(steady) - 1, int(len(steady) * 0.95))]
    n = written // max(config['num_classes'], 1)
    print(f'{written} masks -> {os.path.join(args["save_dir"], args["name"])}')
    print(f'batches {len(lat)} x {B}: steady-state p50 {p50:.1f} ms, '
          f'p95 {p95:.1f} ms, {n / sum(lat):.1f} img/s end-to-end '
          f'(first batch incl. compile {lat[0] * 1e3:.0f} ms)')
    return written


if __name__ == '__main__':
    main()
