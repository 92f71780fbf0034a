#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...detail}

Headline: training throughput (images/sec/chip) of the flagship NestedUNet w/
deep supervision on the reference protocol shapes (96x96x3, BCEDice, SGD
momentum/wd), bf16 compute, full train step (augment+fwd+bwd+update) on device.

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
    parser.add_argument("--steps", default=30, type=int)
    parser.add_argument("--warmup", default=5, type=int)
    parser.add_argument("--quick", action="store_true", help="fewer steps")
    parser.add_argument("--sweep", action="store_true",
                        help="also sweep larger batches and report the best")
    args = parser.parse_args()
    if args.quick:
        args.steps, args.warmup = 8, 2

    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import (
        TrainState, build_optimizer, make_eval_step, make_train_step,
    )

    dev = jax.devices()[0]
    dtype = jnp.bfloat16 if args.precision == "bf16" else None
    hw = args.input_hw

    model = models.create_model(args.arch, 1, 3, args.deep_supervision, dtype=dtype)
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)

    rng = np.random.default_rng(0)

    def measure_train(batch):
        imgs = jnp.asarray(rng.integers(0, 255, (batch, hw, hw, 3), dtype=np.uint8))
        msks = jnp.asarray((rng.random((batch, hw, hw, 1)) > 0.5).astype(np.uint8) * 255)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((batch, hw, hw, 3), jnp.float32), train=True)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, "BCEDiceLoss", args.deep_supervision)
        key = jax.random.PRNGKey(1)
        for i in range(args.warmup):
            key, sub = jax.random.split(key)
            state, metrics = step(state, imgs, msks, sub)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            state, metrics = step(state, imgs, msks, sub)
        jax.block_until_ready(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        return batch / dt, dt * 1e3

    def measure_infer_p50():
        imgs = jnp.asarray(rng.integers(0, 255, (1, hw, hw, 3), dtype=np.uint8))
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, hw, hw, 3), jnp.float32), train=True)
        from pytorch_nested_unet_tpu.training.loop import make_predict_fn

        predict = make_predict_fn(model, args.deep_supervision)
        for _ in range(args.warmup):
            out = predict(variables["params"], variables["batch_stats"], imgs)
        jax.block_until_ready(out)
        ts = []
        for _ in range(max(20, args.steps)):
            t0 = time.perf_counter()
            out = predict(variables["params"], variables["batch_stats"], imgs)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2] * 1e3

    ips, step_ms = measure_train(args.batch_size)
    detail = {
        "device": str(dev),
        "arch": args.arch,
        "deep_supervision": args.deep_supervision,
        "precision": args.precision,
        "batch_size": args.batch_size,
        "input_hw": hw,
        "train_step_ms": round(step_ms, 3),
    }

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

    detail["p50_infer_ms_b1"] = round(measure_infer_p50(), 3)

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
