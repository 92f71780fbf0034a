#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...detail}

Headline: training throughput (images/sec/chip) of the flagship NestedUNet w/
deep supervision on the reference protocol shapes (96x96x3, BCEDice, SGD
momentum/wd), bf16 compute, full train step (augment+fwd+bwd+update) on device.

Measurement method: K train steps run inside ONE jitted lax.scan (single
dispatch), and the clock stops on a scalar readback of the final loss — this
measures true device time. Per-step host dispatch through the remote TPU tunnel
costs ~1.4 ms and `block_until_ready` does not actually block there, so naive
per-call timing is wrong in both directions.

vs_baseline compares against the torch reference implementation measured on this
host (BASELINE_MEASURED.json) — the reference repo publishes no throughput
numbers (BASELINE.md), so that measurement is the baseline the driver tracks.
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--arch", default="NestedUNet")
    parser.add_argument("--deep_supervision", default=True,
                        type=lambda v: str(v).lower() in ("1", "true", "t", "yes"))
    parser.add_argument("--batch_size", default=16, type=int,
                        help="reference protocol batch (trains.py:38)")
    parser.add_argument("--input_hw", default=96, type=int)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    parser.add_argument("--steps", default=20, type=int,
                        help="scan length per timed dispatch")
    parser.add_argument("--repeats", default=3, type=int)
    parser.add_argument("--quick", action="store_true", help="fewer steps")
    parser.add_argument("--sweep", dest="sweep", action="store_true", default=True,
                        help="also sweep larger batches and report the best (default)")
    parser.add_argument("--no_sweep", dest="sweep", action="store_false")
    args = parser.parse_args()
    if args.quick:
        args.steps, args.repeats = 20, 2
        args.sweep = False

    import jax

    # persistent compile cache: first compiles through the remote TPU tunnel
    # cost 60-400s; cached reruns are instant
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import (
        TrainState, build_optimizer, make_eval_step, make_train_step,
    )
    from pytorch_nested_unet_tpu.training.loop import make_predict_fn

    dev = jax.devices()[0]
    dtype = jnp.bfloat16 if args.precision == "bf16" else None
    hw = args.input_hw

    model = models.create_model(args.arch, 1, 3, args.deep_supervision, dtype=dtype)
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)
    rng = np.random.default_rng(0)

    def measure_train(batch):
        """images/sec and ms/step from a K-step scan in one dispatch."""
        imgs = jnp.asarray(rng.integers(0, 255, (batch, hw, hw, 3), dtype=np.uint8))
        msks = jnp.asarray((rng.random((batch, hw, hw, 1)) > 0.5).astype(np.uint8) * 255)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((batch, hw, hw, 3), jnp.float32), train=True)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, "BCEDiceLoss", args.deep_supervision,
                               donate=False)

        @jax.jit
        def run_k(state, key):
            def body(carry, _):
                st, k = carry
                k, sub = jax.random.split(k)
                st, metrics = step(st, imgs, msks, sub)
                return (st, k), metrics["loss"]

            (state, _), losses = lax.scan(body, (state, key), None,
                                          length=args.steps)
            return state, losses[-1]

        # warm up (compile) + one real run
        st, loss = run_k(state, jax.random.PRNGKey(1))
        _ = float(loss)
        best = float("inf")
        for r in range(args.repeats):
            t0 = time.perf_counter()
            st, loss = run_k(st, jax.random.PRNGKey(2 + r))
            _ = float(loss)  # D2H readback is the true completion barrier
            best = min(best, (time.perf_counter() - t0) / args.steps)
        return batch / best, best * 1e3

    def measure_infer(batch=1):
        """p50 end-to-end latency (dispatch + fwd + readback) and pure device
        throughput via a scanned forward."""
        imgs = jnp.asarray(rng.integers(0, 255, (batch, hw, hw, 3), dtype=np.uint8))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((batch, hw, hw, 3), jnp.float32), train=True)
        predict = make_predict_fn(model, args.deep_supervision)
        out = predict(variables["params"], variables["batch_stats"], imgs)
        _ = float(out.sum())
        ts = []
        for _ in range(20):
            t0 = time.perf_counter()
            out = predict(variables["params"], variables["batch_stats"], imgs)
            _ = float(out.sum())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        p50_e2e = ts[len(ts) // 2] * 1e3

        k = 50

        @jax.jit
        def fwd_k(params, stats, x):
            def body(acc, _):
                out = predict(params, stats, x)
                return acc + out.sum(), None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return acc

        acc = fwd_k(variables["params"], variables["batch_stats"], imgs)
        _ = float(acc)
        t0 = time.perf_counter()
        acc = fwd_k(variables["params"], variables["batch_stats"], imgs)
        _ = float(acc)
        dev_ms = (time.perf_counter() - t0) / k * 1e3
        return p50_e2e, dev_ms

    ips, step_ms = measure_train(args.batch_size)
    detail = {
        "device": str(dev),
        "arch": args.arch,
        "deep_supervision": args.deep_supervision,
        "precision": args.precision,
        "batch_size": args.batch_size,
        "input_hw": hw,
        "train_step_ms": round(step_ms, 3),
        "method": f"lax.scan x{args.steps} per dispatch, scalar readback barrier",
    }

    # Roofline: XLA's own cost model for one train step vs what we measured.
    # v5e: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM. The workload (96x96,
    # filters 32-512) is HBM-bound, so % of the bandwidth roofline is the
    # honest utilization number.
    try:
        batch = args.batch_size
        imgs = jnp.asarray(rng.integers(0, 255, (batch, hw, hw, 3), dtype=np.uint8))
        msks = jnp.asarray((rng.random((batch, hw, hw, 1)) > 0.5).astype(np.uint8) * 255)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((batch, hw, hw, 3), jnp.float32), train=True)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, "BCEDiceLoss", args.deep_supervision,
                               donate=False)
        ca = step.lower(state, imgs, msks, jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        hbm_bytes = float(ca.get("bytes accessed", 0.0))
        if flops and hbm_bytes and step_ms:
            detail["roofline"] = {
                "xla_flops_per_step": round(flops / 1e9, 2),  # GFLOP
                "xla_hbm_gb_per_step": round(hbm_bytes / 1e9, 3),
                "achieved_tflops": round(flops / (step_ms * 1e-3) / 1e12, 2),
                "achieved_hbm_gbps": round(hbm_bytes / (step_ms * 1e-3) / 1e9, 1),
                "bound": "hbm" if hbm_bytes / 819e9 > flops / 197e12 else "compute",
                "pct_of_hbm_roofline": round(
                    100 * (hbm_bytes / 819e9) / (step_ms * 1e-3), 1),
            }
    except Exception:
        pass  # cost model availability varies by backend; roofline is optional

    if args.sweep:
        best = (ips, args.batch_size)
        for b in (64, 128, 256):
            try:
                v, _ = measure_train(b)
            except Exception:
                break
            if v > best[0]:
                best = (v, b)
        detail["best_sweep_images_per_sec"] = round(best[0], 2)
        detail["best_sweep_batch"] = best[1]

    p50_e2e, dev_ms = measure_infer(1)
    detail["p50_infer_ms_b1_e2e"] = round(p50_e2e, 3)
    detail["infer_ms_b1_device"] = round(dev_ms, 3)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs = round(ips / base["train_images_per_sec"], 2)
        detail["baseline"] = {
            "train_images_per_sec": base["train_images_per_sec"],
            "hardware": base["hardware"],
        }

    print(json.dumps({
        "metric": "train_images_per_sec_per_chip (NestedUNet wDS, 96x96, batch 16)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": vs,
        **detail,
    }))


if __name__ == "__main__":
    main()
