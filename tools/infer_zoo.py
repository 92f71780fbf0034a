#!/usr/bin/env python
"""Per-arch single-image inference latency for the README zoo table.

Measures, for every registry arch, the pure DEVICE forward time at batch 1
(the serving hot path) using the same two-length-scan slope method as
bench.py's measure_infer — the remote-TPU tunnel's flat ~30 ms dispatch
latency cancels in the fit, and the loop counter perturbs the input so XLA
cannot hoist the loop-invariant forward. Writes one JSON array.

    python tools/infer_zoo.py --out /tmp/infer_zoo.json
"""

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ZOO_ARCHS  # the canonical bench order


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_hw", default=96, type=int)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--scans", default="50,250",
                   help="two scan lengths for the slope fit")
    p.add_argument("--archs", default=None,
                   help="comma list (default: the bench zoo order)")
    p.add_argument("--platform", default="default")
    p.add_argument("--budget_s", default=2400, type=float)
    p.add_argument("--out", default="/tmp/infer_zoo.json")
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training.loop import make_predict_fn

    hw = args.input_hw
    k_a, k_b = (int(x) for x in args.scans.split(","))
    dtype = jnp.bfloat16 if args.precision == "bf16" else None
    archs = args.archs.split(",") if args.archs else ZOO_ARCHS
    t0 = time.perf_counter()
    rows = []

    rng = np.random.default_rng(1 * 100003 + hw)  # bench batch_data seeding
    imgs = jnp.asarray(rng.integers(0, 255, (1, hw, hw, 3), dtype=np.uint8))

    for arch in archs:
        if time.perf_counter() - t0 > args.budget_s:
            rows.append({"arch": arch, "error": "skipped: budget"})
            continue
        ta = time.perf_counter()
        try:
            ds = arch == "NestedUNet"
            model = models.create_model(arch, 1, 3, ds, dtype=dtype)
            variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
                jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3), jnp.float32))
            predict = make_predict_fn(model, ds)

            def make_fwd(k):
                @jax.jit
                def fwd_k(params, stats, x):
                    def body(acc, i):
                        out = predict(params, stats, x + i.astype(x.dtype))
                        return acc + out.sum(), None

                    acc, _ = lax.scan(body, jnp.float32(0),
                                      jnp.arange(k, dtype=jnp.uint8))
                    return acc

                return fwd_k

            fa, fb = make_fwd(k_a), make_fwd(k_b)
            a = (variables["params"], variables["batch_stats"], imgs)
            _ = float(fa(*a)); _ = float(fb(*a))  # compile+warm
            best = float("inf")
            for _r in range(2):
                s = time.perf_counter(); _ = float(fa(*a))
                wa = time.perf_counter() - s
                s = time.perf_counter(); _ = float(fb(*a))
                wb = time.perf_counter() - s
                best = min(best, max(wb - wa, 1e-9) / (k_b - k_a))
            rows.append({"arch": arch,
                         "infer_ms_b1_device": round(best * 1e3, 3),
                         "wall_s": round(time.perf_counter() - ta, 1)})
        except Exception as e:
            rows.append({"arch": arch, "error": f"{type(e).__name__}: {e}",
                         "wall_s": round(time.perf_counter() - ta, 1)})
        jax.clear_caches()
        gc.collect()
        print(json.dumps(rows[-1]), flush=True)
        with open(args.out, "w") as f:
            json.dump({"input_hw": hw, "precision": args.precision,
                       "method": f"two-length scan fit x{k_a}/x{k_b}, batch 1",
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
