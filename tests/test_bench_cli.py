"""Smoke test for bench.py — the driver runs it at the end of every round, so
a rotted bench is a silent round-killer. Runs the real harness end to end on
CPU at tiny shapes and checks the output protocol:

  * the LAST stdout line is a compact contract JSON <= 1,500 bytes that
    survives the driver's ~2 KB tail-window capture (BENCH_r03 ran to rc 0
    yet parsed null because the old enriched last line overflowed it);
  * the full payload lands in BENCH_DETAIL.json and as a non-final line.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # each case runs the real harness end to end

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TAIL_WINDOW = 2048  # bytes the driver keeps from the end of stdout


def _driver_parse(stdout):
    """Exactly what the driver does: keep the last ~2 KB of stdout, parse the
    last line. Raises if the line is not complete JSON."""
    tail = stdout.encode()[-TAIL_WINDOW:].decode(errors="ignore")
    line = tail.strip().splitlines()[-1]
    assert len(line.encode()) <= 1500, f"final line {len(line)}B > cap"
    return json.loads(line)


def _detail(env):
    with open(env["BENCH_DETAIL_PATH"]) as f:
        return json.load(f)


def _env(tmp_path):
    return dict(os.environ, BENCH_DETAIL_PATH=str(tmp_path / "detail.json"))


def test_bench_quick_cpu_emits_contract_json(tmp_path):
    env = _env(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--quick", "--arch", "UNet",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        capture_output=True, text=True, timeout=1200, cwd=_repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = _driver_parse(r.stdout)
    # the driver's contract: metric/value/unit/vs_baseline in one JSON line
    assert out["unit"] == "images/sec/chip"
    assert out["value"] and out["value"] > 0
    assert "metric" in out and "vs_baseline" in out
    assert out["train_step_ms"] > 0
    assert out["p50_infer_ms_b1_e2e"] > 0
    # quick mode early-flushes too (a SIGTERM during infer must not lose it)
    jlines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(jlines) >= 4  # early detail+compact, final detail+compact
    # the full payload: on disk and as the second-to-last stdout line
    det = _detail(env)
    assert det["arch"] == "UNet"
    assert det["infer_ms_b1_device"] > 0
    # --quick must not re-clobber explicit --steps (x2/x10 scan fit)
    assert "x2/x10" in det["method"]
    assert json.loads(jlines[-2])["arch"] == "UNet"


def test_bench_epoch_stage_completes(tmp_path):
    """The epoch stage must produce epoch_s, not an error dict — on hardware
    in round 3 it died converting per-step scan-output metric ARRAYS with
    float() (BENCH warm run: 'Only scalar arrays can be converted...'). Runs
    the stage end to end at a shrunken protocol (--epoch_images)."""
    env = _env(tmp_path)
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet", "--no_zoo", "--no_sweep",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32", "--epoch_images", "8:3"],
        capture_output=True, text=True, timeout=1200, cwd=_repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    out = _driver_parse(r.stdout)
    assert out["epoch_s"] > 0  # surfaced on the compact line
    det = _detail(env)
    assert "error" not in det.get("epoch", {}), det["epoch"]
    assert det["epoch"]["epoch_s"] > 0
    assert det["epoch"]["epoch_pure_train_step_s"] > 0
    # 8:3 with batch 2 exercises the padded last val batch (weighted eval)
    assert "8 train / 3 val" in det["epoch"]["epoch_protocol"]


def test_bench_epoch_images_validation():
    for bad in ("8", "8:4:2", "a:b", "8:-1"):
        r = subprocess.run(
            [sys.executable, os.path.join(_repo, "bench.py"),
             "--platform", "cpu", "--epoch_images", bad],
            capture_output=True, text=True, timeout=120, cwd=_repo)
        assert r.returncode == 2, bad
        assert "TRAIN:VAL" in r.stderr, r.stderr[-500:]


def test_bench_default_path_lands_artifact_when_budget_exhausted(tmp_path):
    """The DRIVER path (no --quick: zoo+sweep+epoch all on) under a tiny
    BENCH_TOTAL_BUDGET_S: the headline must still print a parseable compact
    line that fits the tail window EVEN WITH the full 25-arch zoo skip list
    in the payload — exactly the shape that overflowed BENCH_r03."""
    env = dict(_env(tmp_path), BENCH_TOTAL_BUDGET_S="1")
    r = subprocess.run(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        capture_output=True, text=True, timeout=1200, cwd=_repo, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    final = _driver_parse(r.stdout)
    assert final["unit"] == "images/sec/chip"
    assert final["value"] and final["value"] > 0
    assert "vs_baseline" in final
    # the budget cut epoch/infer/sweep and the whole zoo — summarized on the
    # compact line as counts/names, recorded in full in the detail file
    assert {"epoch", "infer"} <= set(final["skipped_stages"])
    assert any(s.startswith("sweep_batch") for s in final["skipped_stages"])
    assert final["zoo_measured"] == 0 and final["zoo_errors"] == 0
    assert final["zoo_skipped"] == 25
    assert final["bench_wall_s"] > 0
    det = _detail(env)
    assert all("skipped" in row.get("error", "") for row in det["zoo"])
    assert {s["stage"] for s in det["skipped"]} >= {"epoch", "infer"}
    # early compact flush + final compact line both present and parseable
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 4
    early_compact = json.loads(lines[1])
    assert early_compact["value"] > 0
    assert len(lines[1].encode()) <= 1500


def test_bench_sigterm_mid_run_keeps_artifact(tmp_path):
    """`timeout` (the driver) sends SIGTERM. After the early headline flush,
    a SIGTERM must leave a parseable, tail-window-sized contract line and
    exit 0."""
    env = dict(_env(tmp_path), BENCH_TOTAL_BUDGET_S="1200")
    p = subprocess.Popen(
        [sys.executable, os.path.join(_repo, "bench.py"),
         "--platform", "cpu", "--arch", "UNet", "--no_zoo", "--no_sweep",
         "--steps", "2", "--repeats", "1",
         "--batch_size", "2", "--input_hw", "32"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=_repo, env=env)
    try:
        first = None
        collected = []
        for _ in range(400):  # wait for the early flush lines
            line = p.stdout.readline()
            if not line:
                break
            collected.append(line)
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
    stdout = "".join(collected) + rest
    out = _driver_parse(stdout)
    assert out["value"] > 0
