"""Smoke test for bench.py — the driver runs it at the end of every round, so
a rotted bench is a silent round-killer. Runs the real harness end to end on
CPU at tiny shapes and checks the one-line JSON contract."""

import json
import os
import subprocess
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_quick_cpu_emits_contract_json():
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--quick", "--arch", "UNet",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        capture_output=True, text=True, timeout=1200, cwd=_repo)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    # the driver's contract: metric/value/unit/vs_baseline in one JSON line
    assert out["unit"] == "images/sec/chip"
    assert out["value"] and out["value"] > 0
    assert "metric" in out and "vs_baseline" in out
    assert out["arch"] == "UNet"
    assert out["train_step_ms"] > 0
    assert out["p50_infer_ms_b1_e2e"] > 0
    assert out["infer_ms_b1_device"] > 0
    # --quick must not re-clobber explicit --steps (x2/x10 scan fit)
    assert "x2/x10" in out["method"]
