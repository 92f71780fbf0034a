"""Unit tests for tools/record_testrun.py (the test-lineage recorder)."""

import importlib.util
import os
import subprocess
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "record_testrun", os.path.join(_repo, "tools", "record_testrun.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


rt = _mod()


def test_summarize_parses_pytest_tails():
    assert rt.summarize("148 passed, 117 deselected in 280.51s") == {
        "passed": 148, "failed": 0, "skipped": 0, "deselected": 117,
        "error": 0}
    assert rt.summarize("2 failed, 146 passed, 1 skipped in 300s") == {
        "passed": 146, "failed": 2, "skipped": 1, "deselected": 0, "error": 0}
    assert rt.summarize("1 error in 3s")["error"] == 1


def test_main_appends_green_row(tmp_path, monkeypatch):
    out = tmp_path / "TESTRUN.md"

    class R:
        returncode = 0
        stdout = "....\n148 passed, 117 deselected in 280.51s\n"
        stderr = ""

    real_run = subprocess.run

    def fake_run(cmd, **kw):
        if cmd and cmd[0] == sys.executable:
            return R()
        return real_run(cmd, **kw)  # the git rev-parse call stays real

    monkeypatch.setattr(rt.subprocess, "run", fake_run)
    rc = rt.main(["fast", "--dry-file", str(out)])
    assert rc == 0
    text = out.read_text()
    assert "| fast | GREEN | 148 | 0 | 0/117 |" in text
    assert text.startswith("# Test-run lineage")

    # a second append keeps the header single
    rt.main(["fast", "--dry-file", str(out)])
    assert out.read_text().count("# Test-run lineage") == 1


def test_main_marks_red_on_failures(tmp_path, monkeypatch):
    out = tmp_path / "TESTRUN.md"

    class R:
        returncode = 1
        stdout = "2 failed, 146 passed in 300s\n"
        stderr = ""

    real_run = subprocess.run
    monkeypatch.setattr(
        rt.subprocess, "run",
        lambda cmd, **kw: R() if cmd and cmd[0] == sys.executable
        else real_run(cmd, **kw))
    rc = rt.main(["full", "--dry-file", str(out)])
    assert rc == 1
    assert "RED (rc=1)" in out.read_text()
