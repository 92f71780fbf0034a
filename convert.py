#!/usr/bin/env python
"""Checkpoint migration CLI between the torch reference and this framework.

Import (default): bring a reference-trained `model.pth` (saved by reference
trains.py:344-349, optionally through nn.DataParallel) into a
`models/<name>/{config.yml, model.msgpack}` capsule that `val.py --name <name>`
and `train.py --resume`-free fine-tuning can use directly:

    python convert.py --pth model.pth --arch NestedUNet --deep_supervision true \
        --dataset dsb2018_96 --name imported_run

Export (--export): write this framework's best checkpoint back out as a torch
state_dict `.pth` loadable by the reference's archs definitions:

    python convert.py --export --name imported_run --out model_export.pth

Covers the UNet/NestedUNet flagship family (named-attribute keys), the CRDN
family (UNetRNN / UNetRM3 / UNetRM7 / UNetRNNGhost — index-style
unetConv2/score_block/ghost keys, reference finished/archs1.py:214-360,
archs_backup.py:430-871), the dual-attention variants (UNetRNNCAttention
full round-trip; UNetRNNAttention with synthesized gamma=0 attention params,
since the reference builds its PAM/CAM inside forward and never checkpoints
them, archs_backup.py:950-962), the PSP hybrids (UNetRNNCAttention_PSP /
UNetRNNPSP — trunk + CAM gammas round-trip; the refinement net the reference
rebuilds randomly inside every forward, archs_backup.py:1533-1537, is
synthesized from init or grafted from released CascadePSP weights via
--refine_pth, and dropped on export), the attention family (AttU_Net / R2U_Net /
R2AttU_Net, reference archs.py:1322-1474) and CA-Net
(Comprehensive_Atten_Unet, reference archs.py:844-959 — conv_block/gate/SE/
CBAM Sequentials and Linear MLPs) via the per-arch key shims in
utils/torch_convert.py::converters_for_arch; the CascadePSP refinement
network has its own converter (refinement.convert_torch_state_dict).
"""

import argparse
import os
import re
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--pth', default=None, help='torch state_dict to import')
    p.add_argument('--export', action='store_true',
                   help='reverse direction: models/<name> -> torch .pth')
    p.add_argument('--out', default=None,
                   help='export target path (default <name>_export.pth)')
    p.add_argument('--name', default=None,
                   help='capsule name under --output_dir (default '
                        '<dataset>_<arch>_{w,wo}DS)')
    p.add_argument('--arch', default='NestedUNet')
    p.add_argument('--arch_kwargs', default=None, metavar='JSON',
                   help='per-arch constructor options stored in the capsule '
                        '(same syntax as train.py), e.g. '
                        '\'{"decoder": "LSTM"}\' for a UNetRNN import')
    p.add_argument('--deep_supervision', default=False,
                   type=lambda v: str(v).lower() in ('1', 'true', 't', 'yes'))
    p.add_argument('--num_classes', default=1, type=int)
    p.add_argument('--input_channels', default=3, type=int)
    p.add_argument('--input_w', default=96, type=int)
    p.add_argument('--input_h', default=96, type=int)
    p.add_argument('--dataset', default='dsb2018_96')
    p.add_argument('--img_ext', default='.png')
    p.add_argument('--mask_ext', default='.png')
    p.add_argument('--dataset_layout', default='generic',
                   choices=['generic', 'isic'])
    p.add_argument('--refine_pth', default=None, metavar='PATH',
                   help='for the PSP-hybrid archs (UNetRNNCAttention_PSP / '
                        'UNetRNNPSP): populate the in-model refinement '
                        'submodule from a CascadePSP torch checkpoint (e.g. '
                        'the released weights) instead of fresh init — the '
                        'reference never checkpoints it (it builds a random '
                        'PSPNet inside forward, archs_backup.py:1533-1537)')
    p.add_argument('--precision', default='fp32', choices=['bf16', 'fp32'])
    p.add_argument('--output_dir', default='models')
    p.add_argument('--platform', default='default',
                   help="jax platform ('cpu' forces host CPU — conversion is "
                        "pure tree surgery + one model init, no accelerator "
                        "needed; 'default' keeps jax's pick)")
    return vars(p.parse_args(argv))


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield "/".join(prefix), np.shape(tree)


# The reference's RDC cell constructs all four gate convs but the forward uses
# only the selected decoder's (reference finished/archs1.py:145-210); this
# framework creates only the live gates (models/rdc.py).  Imports prune the
# dead branches — and nothing else — from the converted tree.
_DEAD_RDC_GATES = ('gru_catconv', 'gru_conv', 'lstm_catconv', 'vanilla_conv')

# Archs whose reference class constructs part of itself inside `forward`, so
# its checkpoints cannot carry those tensors; imports synthesize them from
# this model's init.  arch -> (missing-key regex, explanation printed).
_PSP_SYNTH_NOTE = (
    "refinement tensors the reference builds as a FRESH RANDOM PSPNet inside "
    "every forward (archs_backup.py:1533-1537) — fixed init here, trainable; "
    "graft the released CascadePSP weights with --refine_pth")
_SYNTHESIZABLE = {
    'UNetRNNAttention': (
        re.compile(r'(^|/)attention_block\d+/(pam|cam)(/|$)'),
        "untrained dual-attention tensors the reference builds at forward "
        "time (gamma=0: attention is a no-op, semantics preserved)"),
    'UNetRNNCAttention_PSP': (re.compile(r'(^|/)psp/'), _PSP_SYNTH_NOTE),
    'UNetRNNPSP': (re.compile(r'(^|/)psp/'), _PSP_SYNTH_NOTE),
}


def _prune_paths(tree, paths):
    for path in paths:
        node = tree
        for p in path[:-1]:
            node = node[p]
        del node[path[-1]]


def _validate_against_model(variables, config, allow_psp_synth=True):
    """Init the target model and check the converted tree matches its
    structure + shapes exactly, so a wrong --arch/--deep_supervision fails
    loudly here instead of at predict time.  Extra keys are fatal unless they
    are the reference's dead RDC gate convs, which are pruned.
    allow_psp_synth=False (a --refine_pth graft happened): missing psp keys
    mean the provided CascadePSP checkpoint was incomplete — fail instead of
    silently mixing released weights with random init."""
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models

    extra_kw = models.parse_arch_kwargs(config['arch'],
                                        config.get('arch_kwargs'))
    model = models.create_model(config['arch'], config['num_classes'],
                                config['input_channels'],
                                config['deep_supervision'], **extra_kw)
    sample = jnp.zeros((1, config['input_h'], config['input_w'],
                        config['input_channels']), jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), sample, train=True)
    want = dict(_tree_paths({k: ref[k] for k in ('params', 'batch_stats')}))
    got = dict(_tree_paths({k: variables[k] for k in ('params', 'batch_stats')}))
    missing = sorted(set(want) - set(got))
    # Some reference classes construct submodules inside `forward` (see
    # _SYNTHESIZABLE), so their checkpoints cannot carry those tensors.
    # Synthesize the missing subtree from this model's init.
    rule = _SYNTHESIZABLE.get(config['arch'])
    if rule and rule[0].pattern == r'(^|/)psp/' and not allow_psp_synth:
        rule = None
    synth = [k for k in missing if rule and rule[0].search(k)]
    if synth:
        for key in synth:
            parts = key.split('/')
            src = ref
            for p in parts:
                src = src[p]
            node = variables
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(src)
        missing = [k for k in missing if k not in synth]
        got = dict(_tree_paths({k: variables[k]
                                for k in ('params', 'batch_stats')}))
        print(f"synthesized {len(synth)} {rule[1]}")
    extra = sorted(set(got) - set(want))
    dead = [k for k in extra
            if any(g in k.split('/') for g in _DEAD_RDC_GATES)]
    if dead:
        _prune_paths(variables, [tuple(k.split('/')) for k in dead])
        extra = [k for k in extra if k not in dead]
        print(f"pruned {len(dead)} dead RDC-gate tensors the reference "
              f"constructs but never uses (e.g. {dead[0]})")
    wrong = sorted(k for k in set(want) & set(got) if want[k] != got[k])
    if missing or extra or wrong:
        msg = [f"converted checkpoint does not match {config['arch']} "
               f"(num_classes={config['num_classes']}, "
               f"input_channels={config['input_channels']}, "
               f"deep_supervision={config['deep_supervision']}):"]
        if missing:
            msg.append(f"  missing ({len(missing)}): {missing[:5]} ...")
        if extra:
            msg.append(f"  unexpected ({len(extra)}): {extra[:5]} ...")
        for k in wrong[:5]:
            msg.append(f"  shape mismatch {k}: checkpoint {got[k]} vs model {want[k]}")
        sys.exit("\n".join(msg))
    return ref


def _load_state_dict(path):
    import torch

    obj = torch.load(path, map_location='cpu', weights_only=True)
    # unwrap {'state_dict': sd, ...metadata} checkpoints: the inner dict of
    # tensors is the state_dict regardless of what sits beside it
    if isinstance(obj, dict) and isinstance(obj.get('state_dict'), dict) and all(
            hasattr(v, 'shape') for v in obj['state_dict'].values()):
        obj = obj['state_dict']
    # nn.DataParallel prefix strip (same as reference segmentation_refinement/
    # main.py:35-40 does for its weights)
    return {(k[len('module.'):] if k.startswith('module.') else k): v
            for k, v in obj.items()}


def main(argv=None):
    args = parse_args(argv)
    from pytorch_nested_unet_tpu.training import checkpoint
    from pytorch_nested_unet_tpu.utils import save_config
    from pytorch_nested_unet_tpu.utils.backend import configure_backend
    from pytorch_nested_unet_tpu.utils.torch_convert import converters_for_arch

    configure_backend(args.get('platform', 'default'))

    if args['export']:
        if not args['name']:
            sys.exit('--export requires --name')
        if args['refine_pth']:
            sys.exit('--refine_pth is an import-time graft; it has no '
                     'meaning with --export (the reference classes carry no '
                     'refinement params to export into)')
        import torch

        model_dir = os.path.join(args['output_dir'], args['name'])
        _, variables, capsule_cfg = checkpoint.load_capsule(model_dir)
        sd = converters_for_arch(capsule_cfg['arch'])[1](variables)
        out = args['out'] or f"{args['name']}_export.pth"
        torch.save({k: torch.from_numpy(np.array(v, copy=True))
                    for k, v in sd.items()}, out)
        print(f"exported {len(sd)} tensors -> {out}")
        return out

    if not args['pth']:
        sys.exit('--pth PATH required (or --export)')
    if args['refine_pth'] and args['arch'] not in ('UNetRNNCAttention_PSP',
                                                   'UNetRNNPSP'):
        sys.exit('--refine_pth only applies to the PSP-hybrid archs '
                 '(UNetRNNCAttention_PSP / UNetRNNPSP)')
    sd = _load_state_dict(args['pth'])
    variables = converters_for_arch(args['arch'])[0](sd)

    if args['refine_pth']:
        from pytorch_nested_unet_tpu.refinement import convert_torch_state_dict
        refine = convert_torch_state_dict(_load_state_dict(args['refine_pth']))
        variables['params']['psp'] = refine['params']
        variables['batch_stats']['psp'] = refine['batch_stats']
        print(f"grafted CascadePSP refinement weights from "
              f"{args['refine_pth']} into the psp submodule")

    config = {k: args[k] for k in
              ('arch', 'arch_kwargs', 'deep_supervision', 'num_classes',
               'input_channels', 'input_w', 'input_h', 'dataset', 'img_ext',
               'mask_ext', 'dataset_layout', 'precision')}
    _validate_against_model(variables, config,
                            allow_psp_synth=not args['refine_pth'])

    if not args['name']:
        tag = 'wDS' if config['deep_supervision'] else 'woDS'
        args['name'] = f"{config['dataset']}_{config['arch']}_{tag}"
    config['name'] = args['name']
    config['loss'] = 'BCEDiceLoss'
    model_dir = os.path.join(args['output_dir'], args['name'])
    os.makedirs(model_dir, exist_ok=True)
    save_config(config, model_dir)
    checkpoint.save_model(model_dir, variables['params'], variables['batch_stats'])
    n = sum(int(np.prod(shape)) for _, shape in _tree_paths(variables['params']))
    print(f"imported {args['pth']} -> {model_dir}/model.msgpack "
          f"({n:,} params); validate with: python val.py --name {args['name']}")
    return model_dir


if __name__ == '__main__':
    main()
