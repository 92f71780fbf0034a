#!/usr/bin/env python
"""AOT-export CLI — trained capsule -> self-contained StableHLO serving artifact.

The reference has no deployment story: serving a checkpoint means re-importing
its whole Python model zoo in-process (reference val.py:34-59). The TPU-native
answer is ahead-of-time export: `jax.export` lowers the jitted predict function
(eval-mode forward + val-pipeline normalization, trained weights baked in as
constants) to ONE serialized StableHLO module:

    python export.py --name dsb2018_96_NestedUNet_wDS
    python infer.py --artifact models/dsb2018_96_NestedUNet_wDS/serving/\
dsb2018_96_NestedUNet_wDS.jaxexport --input_dir new_images/

The serving host needs no model code, no checkpoint files, no arch registry —
just `jax.export.deserialize` (or any StableHLO runtime). The batch dimension
is symbolic by default (one artifact, any batch size), and the module is
lowered for cpu+tpu, so the same file serves a TPU pod or a CPU fallback host.

`--check true` (default) reloads the artifact and verifies a random-input
round trip against the live model before reporting success.
"""

import argparse
import os

from pytorch_nested_unet_tpu.utils import str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument('--name', required=True, help='capsule name (models/<name>)')
    p.add_argument('--output_dir', default='models')
    p.add_argument('--out', default=None,
                   help='artifact path (default: '
                        'models/<name>/serving/<name>.jaxexport)')
    p.add_argument('--batch', default=None, type=int,
                   help='pin the batch dimension to this size (one static '
                        'program); default exports a symbolic batch — one '
                        'artifact serves any batch size')
    p.add_argument('--platforms', default='cpu,tpu',
                   help='comma list of lowering platforms baked into the '
                        'artifact (subset of cpu,tpu,cuda)')
    p.add_argument('--precision', default=None, choices=['bf16', 'fp32'],
                   help="compute precision baked into the artifact (default: "
                        "the capsule's training precision)")
    p.add_argument('--check', default=True, type=str2bool,
                   help='reload the artifact and verify a random-input round '
                        'trip against the live model')
    p.add_argument('--platform', default='default',
                   help='backend used for the --check run')
    return vars(p.parse_args(argv))


def main(argv=None):
    args = parse_args(argv)
    from pytorch_nested_unet_tpu.utils.backend import configure_backend
    configure_backend(args.get('platform', 'default'))

    import jax.numpy as jnp

    from pytorch_nested_unet_tpu.serving import export_capsule, load_exported

    model_dir = os.path.join(args['output_dir'], args['name'])
    dtype = {None: None, 'bf16': jnp.bfloat16, 'fp32': False}[args['precision']]
    platforms = tuple(s.strip() for s in args['platforms'].split(',') if s.strip())
    out_path, manifest = export_capsule(
        model_dir, out_path=args['out'], batch=args['batch'],
        platforms=platforms, precision=dtype)
    print(f"exported {manifest['arch']} ({manifest['name']}) -> {out_path}")
    print(f"  input  uint8 [{manifest['batch']}, {manifest['input_h']}, "
          f"{manifest['input_w']}, {manifest['input_channels']}]  "
          f"platforms {','.join(manifest['platforms'])}  "
          f"{manifest['artifact_bytes'] / 1e6:.1f} MB")

    if args['check']:
        import numpy as np

        from pytorch_nested_unet_tpu.training import checkpoint
        from pytorch_nested_unet_tpu.training.loop import make_predict_fn

        predict_u8, _ = load_exported(out_path)
        model, variables, config = checkpoint.load_capsule(model_dir,
                                                           dtype=dtype)
        live = make_predict_fn(model, config['deep_supervision'])
        b = args['batch'] or 2
        images = np.random.default_rng(0).integers(
            0, 255, (b, manifest['input_h'], manifest['input_w'],
                     manifest['input_channels']), dtype=np.uint8)
        got = np.asarray(predict_u8(images), np.float32)
        want = np.asarray(live(variables['params'], variables['batch_stats'],
                               jnp.asarray(images)), np.float32)
        tol = 2e-2 if manifest['output_dtype'] == 'bfloat16' else 1e-5
        if not np.allclose(got, want, atol=tol):
            raise SystemExit(f'round-trip check FAILED: max abs diff '
                             f'{np.abs(got - want).max():.2e} > {tol}')
        print(f'  round-trip check ok (batch {b}, max abs diff '
              f'{np.abs(got - want).max():.2e})')
    return out_path


if __name__ == '__main__':
    main()
