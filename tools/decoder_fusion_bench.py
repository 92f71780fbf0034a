#!/usr/bin/env python
"""Measure the Pallas fused upsample+concat+conv3x3 decoder op on TPU.

Per NestedUNet decoder node x_{i,j} (reference archs_backup.py:123-141), time
fwd+bwd of:

  A. XLA path:    conv3x3(concat(skips..., upsample2x(low)))   (baseline)
  B. fused path:  ops.decoder_fusion.fused_upcat_conv3x3(parts)
                  with parts = [*skips, upsample2x(low)]

both with the two-length scan fit (cancels the flat axon dispatch latency —
see bench.py).  The fused op's eligibility filter (_supported) is reported
per node; ineligible nodes fall back to XLA inside the op, so their A and B
times should match.

Run on the TPU:  python tools/decoder_fusion_bench.py [--batch 16] [--hw 96]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=96)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from pytorch_nested_unet_tpu.ops import decoder_fusion as df
    from pytorch_nested_unet_tpu.ops.resize import upsample2x

    df.enable_decoder_fusion(True)

    nb = (32, 64, 128, 256, 512)
    B, hw = args.batch, args.hw
    nodes = [(i, j) for j in range(1, 5) for i in range(0, 5 - j)]

    def measure(fn, fn_args, steps, repeats):
        def make(k):
            @jax.jit
            def run(*a):
                def body(acc, t):
                    out = fn(a[0] + t.astype(a[0].dtype), *a[1:])
                    return acc + out, None

                acc, _ = lax.scan(body, jnp.float32(0),
                                  jnp.arange(k, dtype=jnp.uint8))
                return acc

            return run

        ra, rb = make(steps), make(steps * 5)
        _ = float(ra(*fn_args)); _ = float(rb(*fn_args))
        best_a = best_b = float("inf")
        for _r in range(repeats):
            t0 = time.perf_counter(); _ = float(ra(*fn_args))
            best_a = min(best_a, time.perf_counter() - t0)
            t0 = time.perf_counter(); _ = float(rb(*fn_args))
            best_b = min(best_b, time.perf_counter() - t0)
        return max(best_b - best_a, 1e-9) / (4 * steps)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    results = []
    for (i, j) in nodes:
        h = hw >> i
        clow = nb[i + 1]
        cout = nb[i]
        skips = [jnp.asarray(rng.standard_normal((B, h, h, nb[i])), dt)
                 for _ in range(j)]
        low = jnp.asarray(rng.standard_normal((B, h // 2, h // 2, clow)), dt)
        w = jnp.asarray(
            rng.standard_normal((3, 3, j * nb[i] + clow, cout)) * 0.05, dt)
        bias = jnp.asarray(rng.standard_normal((cout,)), dt)

        probe = list(skips) + [upsample2x(low)]
        eligible = df._supported(probe, w)

        def xla_path(s0, *rest):
            srest, low, w, bias = rest[:j - 1], rest[j - 1], rest[j], rest[j + 1]
            parts = (s0,) + srest + (upsample2x(low),)
            if args.fwd_only:
                y = df.reference_multipart_conv3x3(parts, w, bias)
                return y.astype(jnp.float32).sum()
            y, vjp = jax.vjp(
                lambda *a: df.reference_multipart_conv3x3(
                    a[:j] + (upsample2x(a[j]),), a[j + 1], a[j + 2]),
                s0, *srest, low, w, bias)
            gs = vjp(jnp.ones_like(y))
            return (y.astype(jnp.float32).sum()
                    + sum(g.astype(jnp.float32).sum() for g in gs))

        def fused_path(s0, *rest):
            srest, low, w, bias = rest[:j - 1], rest[j - 1], rest[j], rest[j + 1]
            if args.fwd_only:
                y = df.fused_upcat_conv3x3(
                    (s0,) + srest + (upsample2x(low),), w, bias)
                return y.astype(jnp.float32).sum()
            y, vjp = jax.vjp(
                lambda *a: df.fused_upcat_conv3x3(
                    a[:j] + (upsample2x(a[j]),), a[j + 1], a[j + 2]),
                s0, *srest, low, w, bias)
            gs = vjp(jnp.ones_like(y))
            return (y.astype(jnp.float32).sum()
                    + sum(g.astype(jnp.float32).sum() for g in gs))

        fargs = tuple(skips) + (low, w, bias)
        t_a = measure(xla_path, fargs, args.steps, args.repeats)
        t_b = measure(fused_path, fargs, args.steps, args.repeats)
        results.append({
            "node": f"x{i}_{j}", "hw": h, "cin": j * nb[i] + clow,
            "cout": cout, "eligible": bool(eligible),
            "xla_us": round(t_a * 1e6, 1),
            "fused_us": round(t_b * 1e6, 1),
            "win_us": round((t_a - t_b) * 1e6, 1),
        })
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)

    total_a = sum(r["xla_us"] for r in results)
    total_win = sum(r["win_us"] for r in results if r["eligible"])
    print(json.dumps({
        "probe": "pallas fused_upcat_conv3x3 vs XLA, fwd+bwd"
                 if not args.fwd_only else
                 "pallas fused_upcat_conv3x3 vs XLA, fwd only",
        "batch": B, "input_hw": hw, "dtype": args.dtype,
        "per_node": results,
        "total_xla_us": round(total_a, 1),
        "total_eligible_win_us": round(total_win, 1),
    }))


if __name__ == "__main__":
    main()
