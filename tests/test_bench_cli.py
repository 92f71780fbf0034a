"""Smoke test for bench.py — the driver runs it at the end of every round, so
a rotted bench is a silent round-killer. Runs the real harness end to end on
CPU at tiny shapes and checks the one-line JSON contract."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # each case runs the real harness end to end

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


def test_bench_epoch_stage_completes():
    """The epoch stage must produce epoch_s, not an error dict — on hardware
    in round 3 it died converting per-step scan-output metric ARRAYS with
    float() (BENCH warm run: 'Only scalar arrays can be converted...'). Runs
    the stage end to end at a shrunken protocol (--epoch_images)."""
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet", "--no_zoo", "--no_sweep",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32", "--epoch_images", "8:4"],
        capture_output=True, text=True, timeout=1200, cwd=_repo)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert "error" not in out.get("epoch", {}), out["epoch"]
    assert out["epoch"]["epoch_s"] > 0
    assert out["epoch"]["epoch_pure_train_step_s"] > 0
    assert "8 train / 4 val" in out["epoch"]["epoch_protocol"]


def test_bench_default_path_lands_artifact_when_budget_exhausted():
    """The DRIVER path (no --quick: sweep+zoo+epoch all on) under a tiny
    BENCH_TOTAL_BUDGET_S: the headline must still print a parseable contract
    line and every stage the deadline cut must be recorded as skipped —
    BENCH_r02 timed out with ZERO output; this pins the fix."""
    env = dict(os.environ, BENCH_TOTAL_BUDGET_S="1")
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        capture_output=True, text=True, timeout=1200, cwd=_repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    # early headline flush + enriched final line (last-line-wins parser)
    assert len(lines) >= 2, r.stdout
    early, final = json.loads(lines[0]), json.loads(lines[-1])
    for out in (early, final):
        assert out["unit"] == "images/sec/chip"
        assert out["value"] and out["value"] > 0
        assert "vs_baseline" in out
    # the budget cut epoch/infer/sweep and the whole zoo — recorded, not lost
    stages = {s["stage"] for s in final["skipped"]}
    assert {"epoch", "infer"} <= stages
    assert any(s.startswith("sweep_batch") for s in stages)
    assert all("skipped" in row.get("error", "") for row in final["zoo"])
    assert final["bench_wall_s"] > 0


def test_bench_sigterm_mid_run_keeps_artifact():
    """`timeout` (the driver) sends SIGTERM. After the early headline flush,
    a SIGTERM must leave a parseable contract line and exit 0."""
    env = dict(os.environ, BENCH_TOTAL_BUDGET_S="1200")
    p = subprocess.Popen(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet", "--no_zoo", "--no_sweep",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=_repo, env=env)
    try:
        first = None
        for _ in range(400):  # wait for the early flush line
            line = p.stdout.readline()
            if not line:
                break
            if line.startswith("{"):
                first = json.loads(line)
                break
        assert first is not None, "no early contract line before EOF"
        assert first["value"] > 0
        p.send_signal(15)
        rest, _ = p.communicate(timeout=120)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    assert p.returncode == 0
    tail = [l for l in rest.strip().splitlines() if l.startswith("{")]
    if tail:  # the handler emitted the best-known line before exiting
        # (if the run won the race and finished normally, the final enriched
        # line has no note — both outcomes leave a parseable artifact)
        out = json.loads(tail[-1])
        assert out["value"] > 0
