"""Freeze BENCH_BASELINE.json from N quiet-host bench runs.

Round-6 protocol, automated: run bench.py N times (default 3) on a
quiet host, take the per-query MEDIAN and the median calibration as
the anchor, and write the baseline IN FULL — entries and anchor must
describe the same host state (refreshing only changed entries while
keeping an old anchor mis-normalizes future flags, ROUND6_NOTES §3).

Usage: python tools/freeze_baseline.py [n_runs]
Writes BENCH_BASELINE.json and prints per-query spreads > 25% so a
noisy freeze is visible before it is committed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: list[dict] = []
    for i in range(n_runs):
        print(f"[freeze] bench run {i + 1}/{n_runs} ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            runs.append(json.load(f))
    names = sorted(runs[0]["queries"])
    medians = {
        n: round(statistics.median(r["queries"][n] for r in runs), 3)
        for n in names
    }
    cal = round(
        statistics.median(r["calibration_start_s"] for r in runs), 3
    )
    for n in names:
        vals = [r["queries"][n] for r in runs]
        lo, hi = min(vals), max(vals)
        if lo > 0.2 and hi > 1.25 * lo:
            print(
                f"[freeze] NOISY {n}: {['%.2f' % v for v in vals]}",
                file=sys.stderr,
            )
    out = {
        "calibration_s": cal,
        "note": (
            f"median of {n_runs} quiet-host runs "
            f"(tools/freeze_baseline.py); totals "
            f"{[round(r['value'], 1) for r in runs]}, calibrations "
            f"{[r['calibration_start_s'] for r in runs]}"
        ),
        "queries": medians,
        "sf": runs[0]["sf"],
    }
    with open(os.path.join(REPO, "BENCH_BASELINE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"[freeze] wrote BENCH_BASELINE.json: {len(medians)} queries, "
        f"calibration {cal}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
