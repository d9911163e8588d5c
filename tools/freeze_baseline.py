"""Freeze BENCH_BASELINE.json from N quiet-host bench runs.

Round-6 protocol, automated: run bench.py N times (default 3) on a
quiet host, take the per-query MEDIAN and the median calibration as
the anchor, and write the baseline IN FULL — entries and anchor must
describe the same host state (refreshing only changed entries while
keeping an old anchor mis-normalizes future flags, ROUND6_NOTES §3).

Usage: python tools/freeze_baseline.py [n_runs]
Writes BENCH_BASELINE.json and prints per-query spreads > 25% so a
noisy freeze is visible before it is committed.

Re-freeze audit trail (VERDICT r8 #2): a re-freeze re-measures OLD
queries too, so a genuine regression could silently become the new
normal. Before overwriting, this tool diffs the outgoing baseline
against the incoming one (calibration-normalized, so host-speed drift
between freezes doesn't read as regression) and writes
BASELINE_DIFF_r{N}.json with every >1.5x mover flagged. A flagged row
must be hand-annotated with an "explanation" before commit —
tests/test_bench_flags.py fails the suite on an unexplained mover.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# calibrated ratio above which a re-freeze mover must be explained
DIFF_FLAG_RATIO = 1.5
# queries faster than this (new, seconds) are noise-dominated micro
# rows; ratio flags start above the floor (same spirit as bench.py's
# materiality floor)
DIFF_FLOOR_S = 0.3


def current_round(repo: str = REPO) -> int:
    """Rounds are numbered by the driver's CORRECTNESS_r{N}.json
    artifacts; the round being built is the newest one + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def next_diff_path(repo: str = REPO) -> str:
    """Path for this freeze's diff artifact. NEVER an existing file —
    a second freeze in the same round gets a `.2`/`.3` sequence suffix
    so every re-freeze keeps its own old->new audit trail (overwriting
    would lose the first diff, the exact record VERDICT r8 #2 asked
    this tool to preserve)."""
    stem = os.path.join(repo, f"BASELINE_DIFF_r{current_round(repo):02d}")
    path, seq = f"{stem}.json", 2
    while os.path.exists(path):
        path = f"{stem}.{seq}.json"
        seq += 1
    return path


def freeze_diff(old: dict, new: dict) -> dict:
    """Pure diff of two baseline dicts ({calibration_s, queries}).

    Ratios are calibration-normalized: ratio = (new_t / new_cal) /
    (old_t / old_cal), so a uniformly slower host at re-freeze time
    does not flag every query. Movers past DIFF_FLAG_RATIO (either
    direction for the record; only slowdowns are flagged) with new
    time above DIFF_FLOOR_S land in `flagged` and must gain an
    "explanation" before the artifact is committed."""
    old_q = old.get("queries", {})
    new_q = new.get("queries", {})
    old_cal = float(old.get("calibration_s") or 1.0) or 1.0
    new_cal = float(new.get("calibration_s") or 1.0) or 1.0
    rows = {}
    flagged = []
    for name in sorted(set(old_q) & set(new_q)):
        o, n = float(old_q[name]), float(new_q[name])
        raw = round(n / o, 3) if o > 0 else None
        cal = (
            round((n / new_cal) / (o / old_cal), 3) if o > 0 else None
        )
        rows[name] = {"old_s": o, "new_s": n, "ratio_raw": raw,
                      "ratio_calibrated": cal}
        if cal is not None and cal > DIFF_FLAG_RATIO and n > DIFF_FLOOR_S:
            flagged.append(
                {"query": name, "old_s": o, "new_s": n,
                 "ratio_calibrated": cal}
            )
    return {
        "old_calibration_s": old_cal,
        "new_calibration_s": new_cal,
        "flag_ratio": DIFF_FLAG_RATIO,
        "floor_s": DIFF_FLOOR_S,
        "added": sorted(set(new_q) - set(old_q)),
        "removed": sorted(set(old_q) - set(new_q)),
        "flagged": flagged,
        "rows": rows,
    }


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
    baseline_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            old = json.load(f)
        diff = freeze_diff(old, out)
        diff_path = next_diff_path()
        with open(diff_path, "w") as f:
            json.dump(diff, f, indent=1, sort_keys=True)
        print(
            f"[freeze] wrote {os.path.basename(diff_path)}: "
            f"{len(diff['flagged'])} flagged mover(s), "
            f"{len(diff['added'])} added, {len(diff['removed'])} removed",
            file=sys.stderr,
        )
        for fl in diff["flagged"]:
            print(
                f"[freeze] MOVER {fl['query']}: {fl['old_s']} -> "
                f"{fl['new_s']} ({fl['ratio_calibrated']}x cal) — "
                f"annotate an 'explanation' in the diff artifact or "
                f"fix before committing",
                file=sys.stderr,
            )
    with open(baseline_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"[freeze] wrote BENCH_BASELINE.json: {len(medians)} queries, "
        f"calibration {cal}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
