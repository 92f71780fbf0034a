#!/usr/bin/env python
"""Evaluation CLI (reference val.py:31-113): reload the config capsule, rebuild
the model, load the best checkpoint, re-derive the seed-41 val split, write
per-class sigmoid masks x255 as JPEGs to outputs/<name>/<c>/, print IoU."""

import argparse
import os

import cv2
import numpy as np

import jax.numpy as jnp

from pytorch_nested_unet_tpu.data import (
    ISICDataset, SegmentationFolderDataset, epoch_batches, list_image_ids, split_ids,
)
from pytorch_nested_unet_tpu.training import checkpoint
from pytorch_nested_unet_tpu.training.loop import make_predict_fn
from pytorch_nested_unet_tpu.utils import AverageMeter


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--name', default=None, required=True,
                        help='model name (models/<name>)')
    parser.add_argument('--data_dir', default='inputs')
    parser.add_argument('--output_dir', default='models')
    parser.add_argument('--save_dir', default='outputs')
    parser.add_argument('-b', '--batch_size', default=16, type=int)
    parser.add_argument('--refine', default=False,
                        type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'),
                        help='CascadePSP refinement of each prediction before '
                             'scoring (the capability stubbed at reference '
                             'train_ISIC_ca.py:183-189)')
    parser.add_argument('--refine_weights', default=None,
                        help='path to CascadePSP weights (.pth state_dict or '
                             '.npz); random-init refinement if omitted')
    parser.add_argument('--refine_L', default=900, type=int)
    parser.add_argument('--refine_fast', default=False,
                        type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'))
    parser.add_argument('--refine_tile_batch', default=None, type=int,
                        help='batch k sliding-window tiles per device dispatch '
                             'in the full refinement pipeline')
    parser.add_argument('--platform', default='default',
                        help="jax platform ('cpu' forces host CPU; 'default' "
                             "keeps jax's pick)")
    return vars(parser.parse_args(argv))


def main(argv=None):
    args = parse_args(argv)
    from pytorch_nested_unet_tpu.utils.backend import configure_backend
    configure_backend(args.get('platform', 'default'))
    model_dir = os.path.join(args['output_dir'], args['name'])
    model, variables, config = checkpoint.load_capsule(model_dir)

    print('-' * 20)
    for k in sorted(config):
        print(f'{k}: {config[k]}')
    print('-' * 20)

    size_hw = (config['input_h'], config['input_w'])
    base = os.path.join(args['data_dir'], config['dataset'])
    layout = config.get('dataset_layout', 'generic')
    ds_cls = ISICDataset if layout == 'isic' else SegmentationFolderDataset

    from train import _dirs_for
    if os.path.isdir(os.path.join(base, 'test')):
        # physical split: evaluate the test/ dir (reference train_ISIC.py:273-280)
        img_dir, mask_dir = _dirs_for(os.path.join(base, 'test'), layout)
        val_ids = list_image_ids(img_dir, config['img_ext'])
    else:
        img_dir, mask_dir = _dirs_for(base, layout)
        img_ids = list_image_ids(img_dir, config['img_ext'])
        _, val_ids = split_ids(img_ids, 0.2, 41)  # split contract (reference val.py:56)
    val_ds = ds_cls(val_ids, img_dir, mask_dir, config['img_ext'],
                    config['mask_ext'], config['num_classes'])
    images, masks, ids = val_ds.load_all(size_hw)

    params, batch_stats = variables['params'], variables['batch_stats']
    predict = make_predict_fn(model, config['deep_supervision'])

    refiner = None
    if args['refine']:
        from pytorch_nested_unet_tpu.refinement import Refiner

        refiner = Refiner(model_path=args['refine_weights'],
                          tile_batch=args.get('refine_tile_batch'))
        if args['refine_weights'] is None:
            print('warning: --refine without --refine_weights uses a '
                  'random-initialized refinement net')

    for c in range(config['num_classes']):
        os.makedirs(os.path.join(args['save_dir'], args['name'], str(c)), exist_ok=True)

    meter = AverageMeter()
    rng = np.random.default_rng(0)
    for idx, valid in epoch_batches(len(ids), args['batch_size'], rng,
                                    shuffle=False, drop_last=False):
        imgs = jnp.asarray(images[idx])
        msks = jnp.asarray(masks[idx])
        probs = predict(params, batch_stats, imgs)
        probs_np = np.array(probs)  # writable copy (refinement edits in place)
        if refiner is not None:
            # per-image refinement of the class-0 mask (binary protocol), like
            # the Refiner API contract (reference main.py:59-81)
            for j in range(valid):
                refined = refiner.refine(np.asarray(images[idx[j]]),
                                         (probs_np[j, :, :, 0] * 255).astype('uint8'),
                                         fast=args['refine_fast'], L=args['refine_L'])
                probs_np[j, :, :, 0] = refined.astype(np.float32) / 255.0
        # hard IoU at 0.5 (reference metrics.py:6-18) over the valid samples
        pred = probs_np[:valid] > 0.5
        tgt = (np.asarray(msks)[:valid].astype(np.float32) / 255.0) > 0.5
        iou = ((pred & tgt).sum() + 1e-5) / ((pred | tgt).sum() + 1e-5)
        meter.update(float(iou), valid)
        for j in range(valid):
            img_id = ids[idx[j]]
            for c in range(config['num_classes']):
                out_path = os.path.join(args['save_dir'], args['name'], str(c),
                                        img_id + '.jpg')
                cv2.imwrite(out_path, (probs_np[j, :, :, c] * 255).astype('uint8'))

    print(f'IoU: {meter.avg:.4f}')
    return meter.avg


if __name__ == '__main__':
    main()
