#!/usr/bin/env python
"""Measure the headroom of the SURVEY §7 step-10 fusion target: a Pallas
kernel fusing bilinear-upsample + concat + conv3x3 in the NestedUNet decoder
(the reference's memory-traffic hot spot, archs_backup.py:123-141).

Before writing ~400 lines of hand-tiled Pallas conv, this probe answers
"what is the maximum win if the fusion were perfect?" by measuring, per
decoder node x_{i,j}:

  A. the XLA path: y = conv3x3(concat(skips..., upsample2x(low)))  fwd+bwd,
     timed with the two-length scan fit (see bench.py) and costed with XLA's
     own cost model;
  B. the perfect-fusion floor: the same conv reading a PRE-materialized
     input tensor — i.e. exactly the traffic a fused kernel would still have
     to pay (read parts, write conv output; backward reads grads + input
     parts, writes input grads) with the intermediate upsample/concat
     buffers never touching HBM.

  headroom(node) = time(A) - time(B); the sum over the grid's 8 upsample
  nodes bounds what the fused kernel could take off the full train step.

Run on the TPU:  python tools/fusion_probe.py [--batch 16] [--hw 96]
Prints one JSON line with per-node and total numbers.
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
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from pytorch_nested_unet_tpu.ops.resize import upsample2x

    nb = (32, 64, 128, 256, 512)
    B, hw = args.batch, args.hw
    # The 8 decoder nodes that contain an upsample (level i receives nb[i+1]
    # channels from below; j-1 skip tensors of nb[i] channels each).
    nodes = [(i, j) for j in range(1, 5) for i in range(0, 5 - j)]

    def measure(fn, fn_args, steps, repeats):
        """two-length scan fit (cancels the flat tunnel dispatch latency)."""
        def make(k):
            @jax.jit
            def run(*a):
                def body(acc, t):
                    # perturb one input so XLA cannot LICM-hoist the body
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
    results = []
    dt = jnp.bfloat16
    for (i, j) in nodes:
        h = hw >> i
        cin_skips = j * nb[i]
        clow = nb[i + 1]
        cout = nb[i]
        skips = jnp.asarray(rng.standard_normal((B, h, h, cin_skips)), dt)
        low = jnp.asarray(rng.standard_normal((B, h // 2, h // 2, clow)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, cin_skips + clow, cout))
                        * 0.05, dt)
        pre = jnp.concatenate([skips, upsample2x(low)], axis=-1)

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def path_a(skips, low, w):
            y, vjp = jax.vjp(lambda s, l, w: conv(
                jnp.concatenate([s, upsample2x(l)], axis=-1), w), skips, low, w)
            gs, gl, gw = vjp(jnp.ones_like(y))
            return (y.astype(jnp.float32).sum() + gs.astype(jnp.float32).sum()
                    + gl.astype(jnp.float32).sum() + gw.astype(jnp.float32).sum())

        def path_b(pre, w):
            y, vjp = jax.vjp(conv, pre, w)
            gx, gw = vjp(jnp.ones_like(y))
            return (y.astype(jnp.float32).sum() + gx.astype(jnp.float32).sum()
                    + gw.astype(jnp.float32).sum())

        def split_conv(s, l, w):
            # conv(concat(a, b)) == conv_a(a) + conv_b(b): skips in one conv,
            # the upsampled feed in another — the concat buffer never exists.
            y = (conv(s, w[:, :, :cin_skips]) +
                 conv(upsample2x(l), w[:, :, cin_skips:]))
            return y

        def path_c(skips, low, w):
            y, vjp = jax.vjp(split_conv, skips, low, w)
            gs, gl, gw = vjp(jnp.ones_like(y))
            return (y.astype(jnp.float32).sum() + gs.astype(jnp.float32).sum()
                    + gl.astype(jnp.float32).sum() + gw.astype(jnp.float32).sum())

        t_a = measure(path_a, (skips, low, w), args.steps, args.repeats)
        t_b = measure(path_b, (pre, w), args.steps, args.repeats)
        t_c = measure(path_c, (skips, low, w), args.steps, args.repeats)
        results.append({
            "node": f"x{i}_{j}", "hw": h, "cin": cin_skips + clow, "cout": cout,
            "xla_us": round(t_a * 1e6, 1),
            "fused_floor_us": round(t_b * 1e6, 1),
            "split_conv_us": round(t_c * 1e6, 1),
            "headroom_us": round((t_a - t_b) * 1e6, 1),
            "split_win_us": round((t_a - t_c) * 1e6, 1),
        })

    total_a = sum(r["xla_us"] for r in results)
    total_head = sum(r["headroom_us"] for r in results)
    total_split = sum(r["split_win_us"] for r in results)
    print(json.dumps({
        "probe": "nested-decoder upsample+concat+conv3x3 fusion headroom",
        "batch": B, "input_hw": hw, "dtype": "bf16",
        "per_node": results,
        "total_xla_us": round(total_a, 1),
        "total_headroom_us": round(total_head, 1),
        "total_split_conv_win_us": round(total_split, 1),
        "note": "headroom = XLA path minus perfect-fusion floor (conv reading "
                "a pre-materialized input), fwd+bwd per train step; compare "
                "against the flagship step time in BENCH to size the win",
    }))


if __name__ == "__main__":
    main()
