#!/usr/bin/env python
"""Training CLI — flag-compatible with the reference trainer (reference
trains.py:31-103) plus TPU-specific extras.

Example (reference README protocol):
    python train.py --dataset dsb2018_96 --arch NestedUNet --deep_supervision true

Same outputs as the reference: models/<name>/{config.yml, log.csv} and a
best-val-IoU checkpoint (model.msgpack = model.pth analogue); name convention
<dataset>_<arch>_{w,wo}DS (reference trains.py:194-198). Extras: --data_dir,
--precision bf16|fp32, --seed, --resume, --init_from (fine-tune a capsule,
e.g. one imported from a reference .pth by convert.py), --spatial_partition,
--dataset_layout.
"""

import argparse
import os
import signal
import sys
import time
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp
import pandas as pd

from pytorch_nested_unet_tpu import models
from pytorch_nested_unet_tpu.losses import LOSS_NAMES
from pytorch_nested_unet_tpu.data import (
    DeviceDataStore, HostPrefetchLoader, ISICDataset, SegmentationFolderDataset,
    epoch_batches, list_image_ids, split_ids,
)
from pytorch_nested_unet_tpu.parallel import (
    make_mesh, parse_mesh_spec, state_shardings)
from pytorch_nested_unet_tpu.training import (
    LRSchedule, TrainState, build_optimizer, checkpoint, make_eval_step,
    make_train_step, set_learning_rate,
)
from pytorch_nested_unet_tpu.training.loop import (
    make_epoch_evaluator, make_epoch_runner,
)
from pytorch_nested_unet_tpu.training.optim import (
    get_learning_rate, nonfinite_count, params_all_finite,
)
from pytorch_nested_unet_tpu.utils import AverageMeter, count_params, save_config, str2bool
from pytorch_nested_unet_tpu.utils.backend import configure_backend

ARCH_NAMES = models.arch_names()


def _augment_spec(v):
    """Validate --augment at parse time but store the original string (the
    config.yml capsule stays human-readable; parse_augment_spec runs again in
    make_train_step)."""
    from pytorch_nested_unet_tpu.data.augment import parse_augment_spec

    parse_augment_spec(v)  # raises ValueError on unknown ops
    return v


def _remat_mode(v):
    """--remat values: booleans plus the 'full'/'policy' mode strings."""
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in ('policy', 'full'):
        return s
    return str2bool(v)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()

    parser.add_argument('--name', default=None,
                        help='model name: (default: <dataset>_<arch>_{w,wo}DS)')
    parser.add_argument('--epochs', default=100, type=int, metavar='N')
    parser.add_argument('-b', '--batch_size', default=16, type=int, metavar='N')

    # model
    parser.add_argument('--arch', '-a', metavar='ARCH', default='NestedUNet',
                        choices=ARCH_NAMES,
                        help='model architecture: ' + ' | '.join(ARCH_NAMES))
    parser.add_argument('--deep_supervision', default=False, type=str2bool)
    parser.add_argument('--input_channels', default=3, type=int)
    parser.add_argument('--num_classes', default=1, type=int)
    parser.add_argument('--input_w', default=96, type=int)
    parser.add_argument('--input_h', default=96, type=int)

    # loss
    parser.add_argument('--loss', default='BCEDiceLoss', choices=LOSS_NAMES)

    # dataset
    parser.add_argument('--dataset', default='dsb2018_96')
    parser.add_argument('--img_ext', default='.png')
    parser.add_argument('--mask_ext', default='.png')

    # optimizer
    parser.add_argument('--optimizer', default='SGD', choices=['Adam', 'SGD'])
    parser.add_argument('--lr', '--learning_rate', default=1e-3, type=float)
    parser.add_argument('--momentum', default=0.9, type=float)
    parser.add_argument('--weight_decay', default=1e-4, type=float)
    parser.add_argument('--nesterov', default=False, type=str2bool)

    # scheduler
    parser.add_argument('--scheduler', default='CosineAnnealingLR',
                        choices=['CosineAnnealingLR', 'ReduceLROnPlateau',
                                 'MultiStepLR', 'ConstantLR'])
    parser.add_argument('--min_lr', default=1e-5, type=float)
    parser.add_argument('--factor', default=0.1, type=float)
    parser.add_argument('--patience', default=2, type=int)
    parser.add_argument('--milestones', default='1,2', type=str)
    parser.add_argument('--gamma', default=2 / 3, type=float)
    parser.add_argument('--early_stopping', default=-1, type=int, metavar='N')

    parser.add_argument('--num_workers', default=4, type=int,
                        help='kept for flag parity; the device-resident pipeline has no workers')

    # TPU-native extras
    parser.add_argument('--data_dir', default='inputs')
    parser.add_argument('--output_dir', default='models')
    parser.add_argument('--precision', default='bf16', choices=['bf16', 'fp32'],
                        help='conv compute dtype (params always fp32)')
    parser.add_argument('--seed', default=41, type=int)
    parser.add_argument('--resume', default=False, type=str2bool,
                        help='resume from models/<name>/last.msgpack')
    parser.add_argument('--dataset_layout', default='generic', choices=['generic', 'isic'])
    parser.add_argument('--augment', default='full', type=_augment_spec,
                        help="'full' = rot90/flip/color jitter (trains.py:257-266); "
                             "'none' = Resize+Normalize only (the ISIC scripts' "
                             "commented-out augs, train_ISIC.py:282-296); or a "
                             "comma list from {rot90,flip,hsv,brightness,contrast} "
                             "— the per-experiment aug editing the upstream ISIC "
                             "trainers do in code, as a flag")
    parser.add_argument('--log_acc', default=False, type=str2bool,
                        help='log pixel-accuracy columns like trainISIC_wAcc.py:339-368')
    parser.add_argument('--fused_bn', default=False, type=str2bool,
                        help='Pallas-fused BN statistics (single-chip TPU only; '
                             'see ops/fused_bn.py for when this wins)')
    parser.add_argument('--fused_bn_mode', default='stats', choices=['stats', 'full'])
    parser.add_argument('--remat', default=False, type=_remat_mode,
                        help='rematerialize blocks in backward (jax.checkpoint): '
                             'false | true/full (recompute whole blocks, fits '
                             'batch 512 on one v5e) | policy (save only conv '
                             'outputs, recompute BN/ReLU — cuts residual HBM '
                             'traffic at zero conv recompute)')
    parser.add_argument('--profile', default=None, metavar='DIR',
                        help='capture a jax.profiler device trace of epoch 0 '
                             'into DIR (view with tensorboard). The reference '
                             'has no profiling surface at all (SURVEY.md §5).')
    parser.add_argument('--spatial_partition', default=False, type=str2bool,
                        help='also shard H/W over the mesh (halo via XLA SPMD). '
                             'Without --mesh, devices are laid out as '
                             "('data', 'x') with 2-way H partitioning; errors "
                             'if the device count cannot factor')
    parser.add_argument('--mesh', default=None, metavar='SPEC',
                        help="explicit mesh layout, e.g. 'data=4,x=2' "
                             "(axes: 'data' shards batch, 'x'/'y' shard H/W, "
                             "'model' shards conv/dense out-channels + "
                             'optimizer state — tensor parallelism). '
                             'Implies --spatial_partition when x/y axes are '
                             'present. Axis sizes must multiply to at most the '
                             'device count (extra devices stay idle)')
    parser.add_argument('--pipeline', default='device',
                        choices=['device', 'host', 'auto'],
                        help="input pipeline: 'device' keeps the whole uint8 "
                             "dataset HBM-resident (fastest; DSB2018-scale), "
                             "'host' streams batches through a prefetching "
                             "background thread (datasets larger than HBM), "
                             "'auto' picks by dataset size vs device memory")
    parser.add_argument('--checkpoint_backend', default='msgpack',
                        choices=['msgpack', 'orbax'],
                        help="resume-state format: single-file msgpack (the "
                             "model.pth analogue) or orbax (sharding-aware, "
                             "for multi-host runs)")
    parser.add_argument('--skip_nonfinite', default=0, type=int, metavar='N',
                        help='failure detection: skip parameter updates whose '
                             'gradients contain NaN/inf, tolerating up to N '
                             'consecutive bad steps (optax.apply_if_finite); '
                             'a non-finite epoch loss still aborts the run. '
                             '0 disables (reference behavior: NaN poisons the '
                             'weights silently)')
    parser.add_argument('--accum_steps', default=1, type=int, metavar='K',
                        help='accumulate gradients over K micro-batches before '
                             'each update (K-times effective batch at constant '
                             'memory)')
    parser.add_argument('--platform', default='default',
                        help="jax platform to run on ('cpu' forces host CPU — "
                             "hermetic tests/debugging; 'default' keeps jax's "
                             "pick, i.e. the TPU when one is attached)")
    parser.add_argument('--pretrained_backbone', default=None, metavar='PTH',
                        help='torchvision-format ResNet .pth poured into every '
                             'ResNet trunk of the model (the reference '
                             'ImageNet-init surgery, cascadePSP extractors.py:12-33); '
                             'valid for the ResNet-backbone archs and the '
                             'PSP-hybrid refinement trunks')
    parser.add_argument('--init_from', default=None, metavar='CAPSULE',
                        help='initialize model weights from an existing '
                             'models/<name> capsule (a name under --output_dir '
                             'or a directory path) — e.g. fine-tune a '
                             'reference checkpoint imported with convert.py. '
                             'Fresh optimizer/epoch state (unlike --resume)')
    parser.add_argument('--arch_kwargs', default=None, metavar='JSON',
                        help='extra keyword arguments for the model '
                             'constructor as a JSON object, e.g. '
                             '\'{"decoder": "GRU"}\' for the UNetRNN family '
                             'or \'{"layers": [1,1,1,1]}\' for a shallow '
                             'DeepLab (each arch documents its fields)')

    return vars(parser.parse_args(argv))


def _dirs_for(base, layout):
    """Resolve (img_dir, mask_dir) under `base` for a layout. The ISIC layout
    uses flat 'image'/'mask' dirs (reference train_ISIC.py:268-280,300-308);
    generic uses 'images'/'masks/<c>' (reference trains.py:274-289)."""
    if layout == 'isic':
        for img_name in ('image', 'images'):
            if os.path.isdir(os.path.join(base, img_name)):
                return os.path.join(base, img_name), os.path.join(base, 'mask')
        return os.path.join(base, 'image'), os.path.join(base, 'mask')
    return os.path.join(base, 'images'), os.path.join(base, 'masks')


def build_datasets(config):
    """Two dataset layouts, mirroring the reference trainers:
      - seed-41 80/20 split of one pool (trains.py:252-255), or
      - physical train/ + test/ dirs when they exist (train_ISIC.py:268-280).
    """
    base = os.path.join(config['data_dir'], config['dataset'])
    ds_cls = ISICDataset if config['dataset_layout'] == 'isic' else SegmentationFolderDataset

    def mk(ids, img_dir, mask_dir):
        return ds_cls(ids, img_dir, mask_dir, config['img_ext'],
                      config['mask_ext'], config['num_classes'])

    if os.path.isdir(os.path.join(base, 'train')):
        tr_img, tr_mask = _dirs_for(os.path.join(base, 'train'), config['dataset_layout'])
        va_img, va_mask = _dirs_for(os.path.join(base, 'test'), config['dataset_layout'])
        train_ids = list_image_ids(tr_img, config['img_ext'])
        val_ids = list_image_ids(va_img, config['img_ext'])
        if not train_ids:
            sys.exit(f"no images found under {tr_img} (*{config['img_ext']})")
        return mk(train_ids, tr_img, tr_mask), mk(val_ids, va_img, va_mask)

    img_dir, mask_dir = _dirs_for(base, config['dataset_layout'])
    img_ids = list_image_ids(img_dir, config['img_ext'])
    if not img_ids:
        sys.exit(f"no images found under {img_dir} (*{config['img_ext']})")
    train_ids, val_ids = split_ids(img_ids, 0.2, 41)
    return mk(train_ids, img_dir, mask_dir), mk(val_ids, img_dir, mask_dir)


def _build_mesh(config):
    """Resolve (mesh, spatial) from --mesh / --spatial_partition.

    Explicit parallelism flags fail loudly when the device count, batch size,
    or input H/W cannot honor the requested layout — a silently ignored flag is
    worse than an error. With neither flag, multi-device runs get a 1-D 'data'
    mesh when the batch divides evenly (warning + single-device otherwise).
    """
    n_dev = len(jax.devices())
    spatial = bool(config['spatial_partition'])
    if config.get('mesh'):
        try:
            names, sizes = parse_mesh_spec(config['mesh'])
        except ValueError as e:
            sys.exit(f"--mesh: {e}")
        total = int(np.prod(sizes))
        if total > n_dev:
            sys.exit(f"--mesh '{config['mesh']}' needs {total} devices, "
                     f"have {n_dev}")
        mesh = make_mesh(sizes, names, devices=jax.devices()[:total])
        has_spatial_axes = bool({'x', 'y'} & set(names))
        if spatial and not has_spatial_axes:
            sys.exit("--spatial_partition with --mesh requires an 'x' or 'y' "
                     "axis in the spec")
        spatial = spatial or has_spatial_axes
    elif spatial:
        if n_dev < 2 or n_dev % 2:
            sys.exit(f"--spatial_partition needs an even device count >= 2 to "
                     f"factor into ('data', 'x'); have {n_dev} device(s) — use "
                     f"--mesh to lay the axes out explicitly")
        mesh = make_mesh((n_dev // 2, 2), ('data', 'x'))
    elif n_dev > 1:
        if config['batch_size'] % n_dev:
            print(f"warning: batch_size {config['batch_size']} not divisible by "
                  f"{n_dev} devices; running single-device")
            return None, False
        mesh = make_mesh()
    else:
        return None, False

    ax = dict(zip(mesh.axis_names, mesh.devices.shape))
    if config['batch_size'] % ax.get('data', 1):
        sys.exit(f"batch_size {config['batch_size']} not divisible by the "
                 f"mesh 'data' axis size {ax.get('data', 1)}")
    if spatial and (config['input_h'] % ax.get('x', 1)
                    or config['input_w'] % ax.get('y', 1)):
        sys.exit(f"input {config['input_h']}x{config['input_w']} not divisible "
                 f"by the spatial mesh axes {ax}")
    print(f"mesh: {ax}" + (" (spatial H/W partitioning on)" if spatial else ""))
    return mesh, spatial


def _resolve_pipeline(config, n_images):
    """'auto' pipeline policy: stream from host when the uint8 dataset would
    occupy more than a quarter of device memory, else keep it HBM-resident."""
    mode = config.get('pipeline', 'device')
    if mode != 'auto':
        return mode
    bytes_per_img = (config['input_h'] * config['input_w']
                     * (config['input_channels'] + config['num_classes']))
    need = n_images * bytes_per_img
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get('bytes_limit')
    except Exception:
        limit = None
    mode = 'host' if limit and need > limit // 4 else 'device'
    print(f"pipeline auto -> {mode} "
          f"(dataset {need / 1e6:.1f} MB, device limit "
          f"{'unknown' if not limit else f'{limit / 1e6:.0f} MB'})")
    return mode


def main(argv=None):
    config = parse_args(argv)
    configure_backend(config.get('platform', 'default'))

    # Multi-host: each host runs this same program; the coordinator env vars
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) form the
    # global runtime and the mesh below spans every process's chips. All hosts
    # execute the identical SPMD schedule (same seed -> same batch indices over
    # the replicated data store); only process 0 writes files.
    from pytorch_nested_unet_tpu.parallel.multihost import initialize_distributed
    multihost = initialize_distributed()
    if multihost:
        print(f"multi-host: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()}/{jax.device_count()} local/global devices")
    is_main = jax.process_index() == 0

    if config['name'] is None:
        tag = 'wDS' if config['deep_supervision'] else 'woDS'
        config['name'] = f"{config['dataset']}_{config['arch']}_{tag}"
    model_dir = os.path.join(config['output_dir'], config['name'])
    os.makedirs(model_dir, exist_ok=True)

    print('-' * 20)
    for k in sorted(config):
        print(f'{k}: {config[k]}')
    print('-' * 20)
    if is_main:
        save_config(config, model_dir)

    dtype = jnp.bfloat16 if config['precision'] == 'bf16' else None
    extra = {}
    arch_cls = models.get_arch(config['arch'])
    if config.get('remat') and 'remat' in getattr(arch_cls, '__dataclass_fields__', {}):
        extra['remat'] = config['remat']
    if config.get('arch_kwargs'):
        try:
            extra.update(models.parse_arch_kwargs(config['arch'],
                                                  config['arch_kwargs']))
        except ValueError as e:
            sys.exit(f"--arch_kwargs: {e}")
    model = models.create_model(config['arch'], config['num_classes'],
                                config['input_channels'],
                                config['deep_supervision'], dtype=dtype, **extra)

    size_hw = (config['input_h'], config['input_w'])
    train_ds, val_ds = build_datasets(config)
    print(f"train {len(train_ds)} / val {len(val_ds)} images")

    mesh, spatial = _build_mesh(config)
    if config.get('fused_bn') and mesh is None and jax.default_backend() == 'tpu':
        # optional single-chip Pallas BN (ops/fused_bn.py). Off by default:
        # measured on v5e at the reference protocol XLA's native BN handling
        # is faster (16.2 vs 17.2-20.1 ms/step); the kernels remain available
        # for larger-batch/channel regimes. Under a mesh BN must stay
        # XLA-visible so GSPMD syncs the moments.
        from pytorch_nested_unet_tpu.ops.fused_bn import enable_fused_bn
        enable_fused_bn(True, mode=config.get('fused_bn_mode', 'stats'))
        print('fused Pallas BN: enabled (single-chip TPU)')

    pipeline = _resolve_pipeline(config, len(train_ds) + len(val_ds))
    host_pipeline = pipeline == 'host'
    train_store = val_store = None
    if not host_pipeline:
        tr_images, tr_masks, _ = train_ds.load_all(size_hw)
        va_images, va_masks, _ = val_ds.load_all(size_hw)
        train_store = DeviceDataStore(tr_images, tr_masks, mesh)
        val_store = DeviceDataStore(va_images, va_masks, mesh)
    if len(train_ds) < config['batch_size']:
        sys.exit(f"batch_size {config['batch_size']} exceeds the "
                 f"{len(train_ds)}-image training set (drop_last)")

    sample = jnp.zeros((2, *size_hw, config['input_channels']), jnp.float32)
    variables = model.init(jax.random.PRNGKey(config['seed']), sample, train=True)
    print(f"arch {config['arch']}: {count_params(variables['params']):,} params")

    if config.get('init_from'):
        src = config['init_from']
        if not os.path.isdir(src):
            src = os.path.join(config['output_dir'], src)
        if not os.path.isfile(os.path.join(src, 'model.msgpack')):
            sys.exit(f"--init_from: no model.msgpack under {src}")
        try:
            restored = checkpoint.load_model(
                src, {'params': variables['params'],
                      'batch_stats': variables['batch_stats']})
        except (KeyError, ValueError) as e:
            sys.exit(f"--init_from: {src} does not match arch "
                     f"{config['arch']} ({e})")
        # from_bytes checks tree structure but restores same-structure
        # wrong-shaped leaves silently (e.g. a capsule trained with a
        # different num_classes) — pin the shapes here, not inside the jit
        wrong = [f"{jax.tree_util.keystr(kp)}: capsule {np.shape(a)} vs "
                 f"model {np.shape(b)}"
                 for (kp, a), (_, b) in zip(
                     jax.tree_util.tree_leaves_with_path(restored),
                     jax.tree_util.tree_leaves_with_path(
                         {'params': variables['params'],
                          'batch_stats': variables['batch_stats']}))
                 if np.shape(a) != np.shape(b)]
        if wrong:
            sys.exit(f"--init_from: {src} does not match arch "
                     f"{config['arch']} "
                     f"(num_classes/input_channels/arch_kwargs differ): "
                     + "; ".join(wrong[:3]))
        variables = dict(variables, **restored)
        print(f"initialized weights from {src} (fresh optimizer state)")

    if config.get('pretrained_backbone'):
        from pytorch_nested_unet_tpu.utils.pretrained import (
            find_trunk_scopes, graft_trunk, load_pretrained_backbone,
        )
        scopes = find_trunk_scopes(variables['params'])
        if not scopes:
            sys.exit(f"--pretrained_backbone: arch {config['arch']} has no "
                     f"ResNet trunk (encoder/feats scope) to initialize")
        trunk = load_pretrained_backbone(config['pretrained_backbone'])
        for scope in scopes:
            try:
                variables, n = graft_trunk(variables, trunk, scope)
            except (KeyError, ValueError) as e:
                sys.exit(f"--pretrained_backbone: {e}")
            print(f"pretrained backbone: {n} tensors -> {'/'.join(scope)}")

    tx = build_optimizer(config['optimizer'], config['lr'], config['momentum'],
                         config['weight_decay'], config['nesterov'],
                         skip_nonfinite=config.get('skip_nonfinite', 0),
                         accum_steps=config.get('accum_steps', 1))
    state = TrainState.create(variables, tx)

    # Tensor parallelism: a 'model' mesh axis shards conv/dense out-channels
    # (params + optimizer state) across devices — see parallel.mesh.
    tp_shardings = None
    if mesh is not None and 'model' in mesh.axis_names:
        tp_shardings = state_shardings(mesh, state)
        n_tp = sum('model' in str(s.spec)
                   for s in jax.tree.leaves(tp_shardings))
        if not n_tp:
            # a silently ignored axis is worse than an error (cf. _build_mesh)
            sys.exit(f"--mesh: the 'model' axis (size "
                     f"{mesh.shape['model']}) shards nothing in this arch — "
                     f"no kernel has out-channels divisible by it (or all "
                     f"are below the shardable size); drop the axis or "
                     f"change its size")
        print(f"tensor parallel: {n_tp} kernels sharded over "
              f"'model'={mesh.shape['model']}")

    sched = LRSchedule(config['scheduler'], config['lr'], config['epochs'],
                       config['min_lr'], config['factor'], config['patience'],
                       [int(e) for e in str(config['milestones']).split(',')],
                       config['gamma'])

    # Single-device + device-resident data: run the whole epoch as ONE
    # dispatched lax.scan. Under a mesh or the host pipeline, per-step dispatch.
    epoch_scan = mesh is None and not host_pipeline
    if epoch_scan:
        run_epoch = make_epoch_runner(model, tx, config['loss'],
                                      config['deep_supervision'],
                                      augment=config['augment'])
        eval_epoch = make_epoch_evaluator(model, config['loss'],
                                          config['deep_supervision'])
    else:
        train_step = make_train_step(model, tx, config['loss'],
                                     config['deep_supervision'],
                                     augment=config['augment'], mesh=mesh,
                                     spatial=spatial,
                                     state_shardings=tp_shardings)
        eval_step = make_eval_step(model, config['loss'], config['deep_supervision'])

    if config['checkpoint_backend'] == 'orbax':
        if multihost:
            # orbax's multi-process save coordinates over its own barriers and
            # assumes a shared checkpoint filesystem; this framework's
            # multi-host model is process-0-only writes with no shared fs
            sys.exit("--checkpoint_backend orbax is single-host only; "
                     "use msgpack under multi-host")
        save_state_fn = checkpoint.save_training_state_orbax
        load_state_fn = checkpoint.load_training_state_orbax
    else:
        save_state_fn = checkpoint.save_training_state
        load_state_fn = checkpoint.load_training_state

    start_epoch, best_iou, trigger = 0, 0.0, 0
    if config['resume']:
        restored, load_err = None, None
        if is_main or not multihost:
            try:
                restored = load_state_fn(model_dir, state)
            except (KeyError, ValueError) as e:
                # flax restores into the current state's structure; a different
                # optimizer stack changes it (e.g. resuming with
                # --skip_nonfinite or --accum_steps when the run was started
                # without them)
                load_err = (f"--resume: {model_dir}/last.msgpack does not "
                            f"match the current optimizer state layout — "
                            f"--optimizer/--skip_nonfinite/--accum_steps must "
                            f"match the original run ({e})")
                if not multihost:
                    sys.exit(load_err)
        if multihost:
            # Only process 0 writes checkpoints, so only its copy is
            # authoritative — hosts without a shared filesystem have nothing
            # local, and letting each host resume (or not) from its own disk
            # would desynchronize the SPMD schedule (different step counts →
            # collective mismatch/hang). Broadcast process 0's outcome.
            from jax.experimental import multihost_utils
            flag = int(multihost_utils.broadcast_one_to_all(
                np.int32(-1 if load_err else (1 if restored else 0))))
            if flag < 0:
                sys.exit(load_err or "--resume: process 0 failed to restore "
                                     "the training state (see its log)")
            if flag:
                # non-0 processes contribute a structure-only template
                st, ep, bi, tr = restored or (state, 0, 0.0, 0)
                st, ep, bi, tr = multihost_utils.broadcast_one_to_all(
                    (jax.tree_util.tree_map(np.asarray, st),
                     np.int32(ep), np.float32(bi), np.int32(tr)))
                restored = (st, int(ep), float(bi), int(tr))
        if restored:
            state, start_epoch, best_iou, trigger = restored
            start_epoch += 1
            print(f"resumed from epoch {start_epoch - 1} (best iou {best_iou:.4f})")

    if tp_shardings is not None:
        # Lay the (possibly just-restored) state out in the tensor-parallel
        # layout once; the step's in/out_shardings keep it stable thereafter.
        state = jax.device_put(state, tp_shardings)

    log_cols = ['epoch', 'lr', 'loss', 'iou', 'val_loss', 'val_iou']
    if config['log_acc']:
        # column layout of trainISIC_wAcc.py:331-368
        log_cols = ['epoch', 'lr', 'loss', 'iou', 'acc', 'val_loss', 'val_iou', 'val_acc']
    log = OrderedDict((k, []) for k in log_cols)
    log_path = os.path.join(model_dir, 'log.csv')
    if config['resume'] and os.path.exists(log_path):
        prev = pd.read_csv(log_path)
        for k in log:
            log[k] = list(prev[k][:start_epoch])

    data_rng = np.random.default_rng(config['seed'])
    key = jax.random.PRNGKey(config['seed'] + 1)

    train_loader = val_loader = None
    if host_pipeline:
        # The shared data_rng keeps the epoch shuffle identical to the
        # device-resident path at equal seeds (val iteration consumes no rng).
        train_loader = HostPrefetchLoader(train_ds, config['batch_size'], size_hw,
                                          shuffle=True, drop_last=True, rng=data_rng)
        val_loader = HostPrefetchLoader(val_ds, config['batch_size'], size_hw,
                                        shuffle=False, drop_last=False, rng=data_rng)

    # Graceful preemption (TPU pods are preemptible in production): finish the
    # current epoch, persist the full resume state, exit 0. Re-running with
    # --resume continues exactly where training stopped. The reference loses
    # everything past the last best-IoU save (SURVEY.md §5 failure detection).
    preempted = {'flag': False}

    def _on_signal(signum, frame):
        print(f'signal {signum}: finishing epoch, checkpointing, exiting')
        preempted['flag'] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:  # not the main thread (e.g. under a test runner)
            pass

    for epoch in range(start_epoch, config['epochs']):
        lr = sched.epoch_lr(epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        t0 = time.time()

        profiling = config.get('profile') and epoch == start_epoch and is_main
        if profiling:
            jax.profiler.start_trace(config['profile'])

        # ---- train ----
        # With --skip_nonfinite, a bad step's update was already skipped on
        # device, but its recorded loss/iou are still NaN — exclude those steps
        # from the meters so one recovered divergence doesn't poison the epoch
        # averages (and the abort check below).
        guard = bool(config.get('skip_nonfinite'))
        bad_steps = 0

        def _update(meters, step_metrics, weight):
            nonlocal bad_steps
            if guard and not np.isfinite(step_metrics['loss']):
                bad_steps += 1
                return
            for k in meters:
                meters[k].update(float(step_metrics[k]), weight)

        tr_meters = {'loss': AverageMeter(), 'iou': AverageMeter(),
                     'acc': AverageMeter()}
        if epoch_scan:
            batches = [idx for idx, _ in epoch_batches(
                len(train_store), config['batch_size'], data_rng,
                shuffle=True, drop_last=True)]
            if not batches:
                sys.exit(f"batch_size {config['batch_size']} exceeds the "
                         f"{len(train_store)}-image training set (drop_last)")
            key, sub = jax.random.split(key)
            state, metrics = run_epoch(state, train_store.images,
                                       train_store.masks,
                                       jnp.asarray(np.stack(batches)), sub)
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            for s in range(len(batches)):
                _update(tr_meters, {k: metrics[k][s] for k in tr_meters},
                        config['batch_size'])
        else:
            if host_pipeline:
                batch_iter = ((jnp.asarray(imgs), jnp.asarray(msks), valid)
                              for imgs, msks, valid in train_loader)
            else:
                batch_iter = (
                    (jnp.take(train_store.images, jnp.asarray(idx), axis=0),
                     jnp.take(train_store.masks, jnp.asarray(idx), axis=0), valid)
                    for idx, valid in epoch_batches(
                        len(train_store), config['batch_size'], data_rng,
                        shuffle=True, drop_last=True))
            pending = []
            for imgs, msks, valid in batch_iter:
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, imgs, msks, sub)
                pending.append((metrics, valid))
            for metrics, valid in pending:
                _update(tr_meters, {k: float(metrics[k]) for k in tr_meters},
                        valid)
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {config['profile']}")

        # Failure detection (SURVEY.md §5: the reference has none — a NaN loss
        # silently poisons the weights and training continues). Abort before
        # overwriting any good checkpoint when the epoch produced no finite
        # loss at all (guard off: any non-finite average; guard on: every step
        # was non-finite, i.e. the tolerance was exhausted and params are
        # poisoned).
        if tr_meters['loss'].count == 0 or not np.isfinite(tr_meters['loss'].avg):
            skipped = nonfinite_count(state.opt_state)
            detail = f" after {skipped} skipped update(s)" if skipped else ""
            sys.exit(f"non-finite training loss at epoch {epoch}{detail}; "
                     f"aborting without saving (resume from the last good "
                     f"checkpoint with --resume true)")
        if bad_steps:
            print(f"failure detection: {bad_steps} step(s) with non-finite "
                  f"loss this epoch (updates skipped on device, excluded from "
                  f"metrics); {nonfinite_count(state.opt_state)} update(s) "
                  f"skipped since start")
        # apply_if_finite *applies* the bad update once its consecutive-error
        # tolerance is exhausted; the epoch loss average can stay finite (the
        # poisoned steps' losses are excluded above, and a final-step
        # divergence has no subsequent loss at all). Check the params
        # themselves — one fused on-device reduction — before any checkpoint
        # write can clobber the last good state.
        if guard and not params_all_finite(state.params):
            skipped = nonfinite_count(state.opt_state)
            sys.exit(f"non-finite parameters at epoch {epoch}: the "
                     f"--skip_nonfinite tolerance was exhausted ({skipped} "
                     f"update(s) skipped) and a bad update was applied; "
                     f"aborting without saving (resume from the last good "
                     f"checkpoint with --resume true)")

        # ---- validate ----
        va_meters = {'loss': AverageMeter(), 'iou': AverageMeter(),
                     'acc': AverageMeter()}
        if epoch_scan:
            idx_list, valid_list = zip(*epoch_batches(
                len(val_store), config['batch_size'], data_rng,
                shuffle=False, drop_last=False))
            weights = np.stack([(np.arange(config['batch_size']) < v).astype(np.float32)
                                for v in valid_list])
            metrics = eval_epoch(state.params, state.batch_stats,
                                 val_store.images, val_store.masks,
                                 jnp.asarray(np.stack(idx_list)),
                                 jnp.asarray(weights))
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            for s, valid in enumerate(valid_list):
                for k in va_meters:
                    va_meters[k].update(float(metrics[k][s]), valid)
        else:
            if host_pipeline:
                batch_iter = ((jnp.asarray(imgs), jnp.asarray(msks), valid)
                              for imgs, msks, valid in val_loader)
            else:
                batch_iter = (
                    (jnp.take(val_store.images, jnp.asarray(idx), axis=0),
                     jnp.take(val_store.masks, jnp.asarray(idx), axis=0), valid)
                    for idx, valid in epoch_batches(
                        len(val_store), config['batch_size'], data_rng,
                        shuffle=False, drop_last=False))
            pending = []
            for imgs, msks, valid in batch_iter:
                weights = jnp.asarray(
                    (np.arange(config['batch_size']) < valid).astype(np.float32))
                metrics = eval_step(state.params, state.batch_stats, imgs, msks, weights)
                pending.append((metrics, valid))
            for metrics, valid in pending:
                for k in va_meters:
                    va_meters[k].update(float(metrics[k]), valid)

        sched.plateau_step(va_meters['loss'].avg)

        dt = time.time() - t0
        print(f"epoch [{epoch}/{config['epochs']}] "
              f"loss {tr_meters['loss'].avg:.4f} - iou {tr_meters['iou'].avg:.4f} "
              f"- val_loss {va_meters['loss'].avg:.4f} - val_iou {va_meters['iou'].avg:.4f} "
              f"({dt:.1f}s, {tr_meters['loss'].count / max(dt, 1e-9):.1f} img/s)")

        log['epoch'].append(epoch)
        log['lr'].append(lr)  # actual scheduled lr (the reference logs initial lr — bug fixed)
        log['loss'].append(tr_meters['loss'].avg)
        log['iou'].append(tr_meters['iou'].avg)
        log['val_loss'].append(va_meters['loss'].avg)
        log['val_iou'].append(va_meters['iou'].avg)
        if config['log_acc']:
            log['acc'].append(tr_meters['acc'].avg)
            log['val_acc'].append(va_meters['acc'].avg)
        if is_main:
            pd.DataFrame(log).to_csv(log_path, index=False)

        trigger += 1
        if va_meters['iou'].avg > best_iou:
            # every process calls (the host gather inside is a collective
            # under multi-host tensor parallelism); only process 0 writes
            checkpoint.save_model(model_dir, state.params, state.batch_stats)
            if is_main:
                print("=> saved best model")
            best_iou = va_meters['iou'].avg
            trigger = 0
        save_state_fn(model_dir, state, epoch, best_iou, trigger)

        if 0 <= config['early_stopping'] <= trigger:
            print("=> early stopping")
            break
        if preempted['flag']:
            print(f"=> preempted at epoch {epoch}; resume with --resume true")
            break

    print(f"best val iou: {best_iou:.4f}")
    return best_iou


if __name__ == '__main__':
    main()
