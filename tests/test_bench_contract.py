"""Unit tests for bench.py's compact final-line contract (no jax, fast lane).

BENCH_r03 ran to rc 0 yet parsed null: the enriched final stdout line carried
the whole 25-row zoo array and overflowed the driver's ~2 KB tail-capture
window, so the last line it saw started mid-JSON. These tests pin the fix at
the unit level: _compact() output stays under the 1,500-byte cap for
worst-case payloads and always keeps the four contract keys.
"""

import importlib.util
import json
import os

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _bench()


def _worst_case_payload():
    """Every field populated the way a full hardware run populates it, zoo at
    its maximum 25 rows, every stage skipped AND noted — strictly larger than
    anything the real harness emits."""
    zoo = []
    for arch in bench.ZOO_ARCHS:
        zoo.append({"arch": arch, "deep_supervision": arch == "NestedUNet",
                    "train_images_per_sec": 1234.5, "train_step_ms": 123.456,
                    "compile_s": 400.9, "wall_s": 999.9,
                    "pct_of_hbm_roofline": 99.9, "achieved_tflops": 123.45})
    skipped = ([{"stage": s, "reason": "total budget exhausted"}
                for s in ("roofline", "epoch", "infer")]
               + [{"stage": f"sweep_batch_{b}",
                   "reason": "total budget exhausted"}
                  for b in (64, 128, 256)])
    return {
        "metric": "train_images_per_sec_per_chip (Comprehensive_Atten_Unet"
                  " wDS, 2048x2048, batch 4096)",
        "value": 123456.78, "unit": "images/sec/chip", "vs_baseline": 1234.56,
        "device": "TPU_7(process=0,(0,0,0,0))",
        "device_kind": "TPU v5 lite with a hypothetically long kind string",
        "arch": "Comprehensive_Atten_Unet",
        "arch_kwargs": {"remat": "policy", "filters": [64, 128, 256, 512]},
        "deep_supervision": True, "precision": "bf16",
        "batch_size": 4096, "input_hw": 2048,
        "train_step_ms": 12345.678,
        "method": "two-length lax.scan fit (x20/x100), scalar readback "
                  "barrier; flat per-dispatch latency cancels",
        "dispatch_overhead_ms": 30.25, "headline_compile_s": 432.1,
        "baseline": {"train_images_per_sec": 123.45,
                     "hardware": "NVIDIA A100-SXM4-40GB, torch 2.5, cuda"},
        "roofline": {"xla_flops_per_step": 1e9, "xla_hbm_gb_per_step": 99.9,
                     "achieved_tflops": 197.0, "achieved_hbm_gbps": 819.0,
                     "assumed_hardware": "TPU v5 lite",
                     "peaks": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
                     "bound": "hbm", "pct_of_hbm_roofline": 100.0},
        "epoch": {"epoch_s": 1234.567,
                  "epoch_protocol": "670 train / 134 val images, batch 16, "
                                    "incl. eval+metrics+log write",
                  "epoch_pure_train_step_s": 1000.0,
                  "epoch_overhead_s": 234.567},
        "p50_infer_ms_b1_e2e": 9999.999, "infer_ms_b1_device": 9999.999,
        "best_sweep_images_per_sec": 99999.99, "best_sweep_batch": 256,
        "zoo": zoo, "skipped": skipped,
        "bench_wall_s": 99999.9, "bench_total_budget_s": 1500.0,
        "note": "terminated by SIGALRM before all stages finished",
        "detail_file": "BENCH_DETAIL.json",
    }


def test_compact_fits_tail_window_on_worst_case():
    line = json.dumps(bench._compact(_worst_case_payload()))
    assert len(line.encode()) <= bench._LINE_CAP
    out = json.loads(line)
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in out
    # the summaries the judge needs survive on the compact line
    assert out["train_step_ms"] == 12345.678
    assert out["epoch_s"] == 1234.567
    assert out["best_sweep_images_per_sec"] == 99999.99
    assert out["zoo_measured"] == 25
    assert out["zoo_skipped"] == 0 and out["zoo_errors"] == 0
    assert out["detail_file"] == "BENCH_DETAIL.json"


def test_compact_zoo_counts_split_measured_skipped_errors():
    p = _worst_case_payload()
    p["zoo"] = [
        {"arch": "UNet", "train_images_per_sec": 1.0},
        {"arch": "NestedUNet", "error": "skipped: total budget exhausted"},
        {"arch": "DeepLab", "error": "ValueError: boom"},
    ]
    out = bench._compact(p)
    assert (out["zoo_measured"], out["zoo_skipped"], out["zoo_errors"]) \
        == (1, 1, 1)
    assert out["skipped_stages"] == ["roofline", "epoch", "infer",
                                     "sweep_batch_64", "sweep_batch_128",
                                     "sweep_batch_256"]


def test_compact_never_drops_contract_keys_under_adversarial_note():
    p = _worst_case_payload()
    p["note"] = "x" * 4000  # even an absurd note can't break the cap
    line = json.dumps(bench._compact(p))
    # the oversized note forces optional keys (note included, it drops last
    # from the priority order's tail upward) out until the line fits
    assert len(line.encode()) <= bench._LINE_CAP
    out = json.loads(line)
    assert out["value"] == 123456.78
    assert out["unit"] == "images/sec/chip"


def test_compact_counts_zoo_start_skips_separately():
    # deliberate --zoo_start cache-warming skips must not masquerade as (or
    # hide) budget-exhaustion skips in the driver-visible contract
    p = _worst_case_payload()
    p["zoo"] = [
        {"arch": "UNet", "error": "skipped: --zoo_start"},
        {"arch": "NestedUNet", "error": "skipped: --zoo_start"},
        {"arch": "UNetRNN", "train_images_per_sec": 1.0},
        {"arch": "DeepLab", "error": "skipped: total budget exhausted"},
    ]
    out = bench._compact(p)
    assert (out["zoo_measured"], out["zoo_start_skipped"], out["zoo_skipped"],
            out["zoo_errors"]) == (1, 2, 1, 0)


def test_compact_keeps_truncated_flag():
    # the structured partial-run marker must survive compaction ahead of
    # everything else droppable (rc stays 0 on watchdog exits — the flag is
    # the only machine-readable evidence the artifact is partial)
    p = _worst_case_payload()
    p["truncated"] = True
    p["note"] = "x" * 4000  # force the drop loop to run
    line = json.dumps(bench._compact(p))
    assert len(line.encode()) <= bench._LINE_CAP
    assert json.loads(line)["truncated"] is True


def test_emitter_marks_truncated_payloads(tmp_path, capsys):
    em = bench._Emitter()
    em.detail_path = str(tmp_path / "d.json")
    em.set({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": None})
    assert em.emit(note="watchdog", truncated=True)
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[-1])["truncated"] is True
    assert json.load(open(em.detail_path))["truncated"] is True
    # a normal emit leaves no stale flag behind
    assert em.emit()
    lines = capsys.readouterr().out.strip().splitlines()
    assert "truncated" not in json.loads(lines[-1])


def test_compact_minimal_headline_only_payload():
    out = bench._compact({
        "metric": "train_images_per_sec_per_chip (NestedUNet wDS, 96x96, "
                  "batch 16)",
        "value": 1061.0, "unit": "images/sec/chip", "vs_baseline": 8.4,
    })
    assert out["value"] == 1061.0
    assert "zoo_measured" not in out and "epoch_s" not in out


# ---------------------------------------------------------------------------
# probe_accelerator: the wait-out-the-outage-window loop (r05's #1 fix —
# BENCH_r02/r03/r04 all parsed null; r04 because a fixed 4x180s retry cap
# gave up inside a 15+ minute tunnel window that then passed)


class _Clock:
    """Deterministic budget clock: left() decreases by what probes/sleeps
    consume."""

    def __init__(self, budget):
        self.t = 0.0
        self.budget = budget

    def left(self):
        return self.budget - self.t


def _result(rc, err=""):
    class R:
        returncode = rc
        stderr = err
        stdout = ""
    return R()


def _runner_seq(clock, outcomes, cost=180.0):
    """Fake subprocess.run: pops the next outcome; 'timeout' raises
    TimeoutExpired after consuming the wait, 'ok'/'fail' consume `cost`."""
    import subprocess

    calls = []

    def run(cmd, capture_output, text, timeout):
        calls.append(timeout)
        out = outcomes.pop(0) if outcomes else "timeout"
        if out == "timeout":
            clock.t += timeout
            raise subprocess.TimeoutExpired(cmd, timeout)
        clock.t += min(cost, timeout)
        return _result(0 if out == "ok" else 1, "RuntimeError: boom")

    run.calls = calls
    return run


def _sleeper(clock):
    def sleep(s):
        clock.t += s
    return sleep


def test_probe_succeeds_first_try():
    clock = _Clock(1500)
    run = _runner_seq(clock, ["ok"], cost=5.0)
    assert bench.probe_accelerator(clock.left, runner=run,
                                   sleep=_sleeper(clock)) is None
    assert len(run.calls) == 1


def test_probe_waits_out_a_long_outage_window(capsys):
    # 5 consecutive 180 s timeouts (a ~15-minute window) then the tunnel
    # answers — the old 4-retry cap lost this race; the budget loop wins it
    clock = _Clock(2400)
    run = _runner_seq(clock, ["timeout"] * 5 + ["ok"])
    assert bench.probe_accelerator(clock.left, runner=run,
                                   sleep=_sleeper(clock)) is None
    assert len(run.calls) == 6
    assert clock.left() > 300  # succeeded with the headline reserve intact


def test_probe_stops_with_reserve_left_when_tunnel_never_answers():
    clock = _Clock(1500)
    run = _runner_seq(clock, [])  # every probe times out
    reason = bench.probe_accelerator(clock.left, runner=run,
                                     sleep=_sleeper(clock))
    assert reason and "timed out" in reason[0]
    # it must keep most of the reserve for the error contract, and must have
    # probed well past the old 4-attempt cap's ~12 minutes of effort
    assert clock.left() >= 250
    assert sum(run.calls) + 20 * (len(run.calls) - 1) >= 1000


def test_probe_respects_explicit_retry_cap():
    clock = _Clock(10_000)
    run = _runner_seq(clock, [])
    reason = bench.probe_accelerator(clock.left, probe_retries=3, runner=run,
                                     sleep=_sleeper(clock))
    assert reason is not None
    assert len(run.calls) == 3


def test_probe_reports_subprocess_error_line():
    clock = _Clock(1500)
    run = _runner_seq(clock, ["fail", "ok"], cost=5.0)
    assert bench.probe_accelerator(clock.left, runner=run,
                                   sleep=_sleeper(clock)) is None
    assert len(run.calls) == 2
