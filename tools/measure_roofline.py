#!/usr/bin/env python
"""Measured-bytes roofline for the flagship train step (VERDICT r04 weak #3).

The bench's roofline block divides XLA's *cost-model* byte count by the step
time — but fusion invalidates the naive count, so ">100% of HBM roofline"
could mean either "near speed-of-light" or "cost model wrong by 2x". This
tool replaces the argument with a measurement: it runs the flagship NestedUNet
train step under jax.profiler and reads the DEVICE-measured activity from the
xplane — per-op device times and, where libtpu exposes them, memory-bandwidth
counters — then reports measured HBM GB/step next to the cost-model number.

Usage:
    python tools/measure_roofline.py                 # real chip
    python tools/measure_roofline.py --platform cpu  # plumbing check
    python tools/measure_roofline.py --dump_stats    # list every xplane stat
                                                     # name seen (forensics)

Output: one JSON object on stdout; optionally merged into README/BENCH_DETAIL
by hand (this is an analysis tool, not part of the driver contract).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(args):
    import jax
    import jax.numpy as jnp

    from pytorch_nested_unet_tpu import models
    from pytorch_nested_unet_tpu.training import (
        TrainState, build_optimizer, make_train_step,
    )

    dtype = jnp.bfloat16 if args.precision == "bf16" else None
    model = models.create_model(args.arch, 1, 3, args.deep_supervision,
                                dtype=dtype)
    hw, batch = args.input_hw, args.batch_size
    rng = np.random.default_rng(batch * 100003 + hw)  # bench seeding scheme
    imgs = jnp.asarray(rng.integers(0, 255, (batch, hw, hw, 3), dtype=np.uint8))
    msks = jnp.asarray((rng.random((batch, hw, hw, 1)) > 0.5).astype(np.uint8) * 255)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((batch, hw, hw, 3), jnp.float32))
    tx = build_optimizer("SGD", 1e-3, 0.9, 1e-4)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, "BCEDiceLoss", args.deep_supervision,
                           donate=False)
    lowered = step.lower(state, imgs, msks, jax.random.PRNGKey(0))
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return step, state, imgs, msks, ca


def parse_xplane(trace_dir, dump_stats=False):
    """Walk every device plane of the captured xplane and aggregate:
      - total device-op time (ns) per plane,
      - any stat whose name looks like a byte / bandwidth counter.
    Returns (per_plane dict, sorted stat-name list)."""
    import jax

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data = jax.profiler.ProfileData.from_serialized_xspace(
        open(paths[0], "rb").read())
    stat_names = set()
    planes = {}
    BYTE_KEYS = ("bytes", "bandwidth", "bw", "dma", "hbm", "memory")
    for plane in data.planes:
        name = plane.name
        is_device = ("TPU" in name or "GPU" in name
                     or "/device:" in name) and "host" not in name.lower()
        total_ns = 0
        byte_stats = {}
        events = 0
        for line in plane.lines:
            for ev in line.events:
                events += 1
                dur = ev.duration_ns
                if dur:
                    total_ns += int(dur)
                for k, v in ev.stats:
                    stat_names.add(k)
                    lk = k.lower()
                    if any(b in lk for b in BYTE_KEYS):
                        try:
                            byte_stats[k] = byte_stats.get(k, 0) + float(v)
                        except (TypeError, ValueError):
                            pass
        planes[name] = {"events": events, "sum_event_ns": total_ns,
                        "is_device": is_device, "byte_stats": byte_stats}
    return planes, sorted(stat_names) if dump_stats else []


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="NestedUNet")
    p.add_argument("--deep_supervision", default=True,
                   type=lambda v: str(v).lower() in ("1", "true", "t", "yes"))
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--input_hw", default=96, type=int)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--steps", default=20, type=int,
                   help="profiled steps (scanned in one dispatch)")
    p.add_argument("--platform", default="default")
    p.add_argument("--dump_stats", action="store_true")
    p.add_argument("--trace_dir", default=None,
                   help="keep the trace here instead of a temp dir")
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    step, state, imgs, msks, ca = build_step(args)

    @jax.jit
    def run_k(state, key):
        def body(carry, _):
            st, kk = carry
            kk, sub = jax.random.split(kk)
            st, metrics = step(st, imgs, msks, sub)
            return (st, kk), metrics["loss"]

        (state, _), losses = lax.scan(body, (state, key), None,
                                      length=args.steps)
        return state, losses[-1]

    # warm (compile) outside the trace
    st, loss = run_k(state, jax.random.PRNGKey(1))
    _ = float(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="roofline_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        st, loss = run_k(st, jax.random.PRNGKey(2))
        _ = float(loss)
    wall_s = time.perf_counter() - t0

    planes, stat_names = parse_xplane(trace_dir, args.dump_stats)

    flops = float(ca.get("flops", 0.0))
    cm_bytes = float(ca.get("bytes accessed", 0.0))
    dev_planes = {n: p for n, p in planes.items() if p["is_device"]}
    # device time per step: the busiest device plane's summed event time is
    # an upper bound (parallel lines may overlap); report per-plane so the
    # reader can see the structure
    out = {
        "arch": args.arch,
        "deep_supervision": args.deep_supervision,
        "batch_size": args.batch_size,
        "input_hw": args.input_hw,
        "precision": args.precision,
        "profiled_steps": args.steps,
        "wall_s_for_scan": round(wall_s, 4),
        "cost_model": {
            "flops_per_step_g": round(flops / 1e9, 2),
            "hbm_gb_per_step": round(cm_bytes / 1e9, 4),
        },
        "planes": {
            n: {
                "events": p["events"],
                "sum_event_ms": round(p["sum_event_ns"] / 1e6, 3),
                "sum_event_ms_per_step": round(
                    p["sum_event_ns"] / 1e6 / args.steps, 4),
                **({"byte_stats": p["byte_stats"]} if p["byte_stats"] else {}),
            }
            for n, p in (planes if args.dump_stats else dev_planes).items()
        },
    }
    if args.dump_stats:
        out["stat_names"] = stat_names
    print(json.dumps(out, indent=1))
    if not args.trace_dir:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
