"""Rewrite the README's registry-derived surface counts — and the
current round notes' stamped summary block — in place.

The counts are enforced by tests/test_docs.py; this is the one place
that edits them. Run after registering queries or re-running bench:
    python tools/refresh_docs.py

Round-note headline numbers drifted twice in round 5 (a wrong registry
delta, a flags claim that didn't describe the round's official bench
artifact), so from round 6 on the notes' summary block is GENERATED
from the JSON artifacts between `<!-- stamped:begin -->` /
`<!-- stamped:end -->` markers, the same way README counts are pinned.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tugas_2_big_data_spark import queries as q  # noqa: E402

README = os.path.join(REPO, "README.md")
STAMP_BEGIN = "<!-- stamped:begin -->"
STAMP_END = "<!-- stamped:end -->"

# Builder-owned snapshots of the driver-owned artifacts the stamp
# reads. The driver overwrites BENCH_FULL.json and drops a new
# CORRECTNESS_r*.json AFTER the builder's final commit every round, so
# stamping (and the test re-deriving the stamp) from the live files
# guaranteed a red test_round_notes_stamped_block_is_current at judge
# time (round-7 verdict #2). The stamp now reads these snapshots,
# taken at stamp time and committed with the notes.
BENCH_SNAP = os.path.join(REPO, "BENCH_STAMPED.json")
CORR_SNAP = os.path.join(REPO, "CORRECTNESS_STAMPED.json")


def snapshot_artifacts() -> None:
    """Freeze the current BENCH_FULL.json and latest CORRECTNESS_r*.json
    into builder-owned snapshot files; the correctness snapshot wraps
    the rows with its source basename so the stamp can name it."""
    import shutil

    bench = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(bench):
        shutil.copyfile(bench, BENCH_SNAP)
    corr = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if corr:
        with open(corr[-1]) as f:
            rows = json.load(f)
        with open(CORR_SNAP, "w") as f:
            json.dump(
                {"source": os.path.basename(corr[-1]), "rows": rows},
                f,
                indent=2,
            )


def latest_round_notes() -> str | None:
    """Highest-numbered ROUND*_NOTES.md, or None."""
    notes = glob.glob(os.path.join(REPO, "ROUND*_NOTES.md"))
    if not notes:
        return None

    def round_no(path: str) -> int:
        m = re.search(r"ROUND(\d+)_NOTES", path)
        return int(m.group(1)) if m else -1

    return max(notes, key=round_no)


def stamped_block() -> str:
    """The generated summary lines — every number read from the live
    registry or a JSON artifact, never typed."""
    reg = q.queries()
    oracles = q.oracle_sql()
    n_stream = sum(1 for n in reg if n.startswith("stream_"))
    lines = [
        f"- Registry: {len(reg)} queries ({n_stream} streaming), "
        f"{len(set(reg) & set(oracles))}/{len(reg)} with a DuckDB value "
        f"oracle."
    ]
    if os.path.exists(BENCH_SNAP):
        with open(BENCH_SNAP) as f:
            b = json.load(f)
        flags = b.get("regressions_vs_baseline", {})
        lines.append(
            f"- Bench (BENCH_STAMPED.json, snapshot of BENCH_FULL.json "
            f"at stamp time): {b['value']} s total over "
            f"{len(b.get('queries', {}))} queries at sf{b.get('sf')}; "
            f"calibration {b.get('calibration_s')} vs frozen "
            f"{b.get('calibration_baseline_s')}; "
            f"{len(flags)} rerun-confirmed regression flags"
            + (f" ({', '.join(sorted(flags))})." if flags else ".")
        )
    if os.path.exists(CORR_SNAP):
        with open(CORR_SNAP) as f:
            snap = json.load(f)
        c = snap["rows"]
        ok = sum(
            1
            for r in c.values()
            if isinstance(r, dict)
            and r.get("rows_match")
            and r.get("schema_match")
            and r.get("hash_match") is not False
        )
        lines.append(
            f"- Latest driver correctness artifact at stamp time "
            f"({snap['source']}): {ok}/{len(c)} rows pass."
        )
    return "\n".join(lines)


def main() -> None:
    text = open(README).read()
    n = len(q.queries())
    n_stream = sum(1 for name in q.queries() if name.startswith("stream_"))
    text = re.sub(r"\d+ registered queries", f"{n} registered queries", text)
    text = re.sub(
        r"\d+ Structured Streaming drains",
        f"{n_stream} Structured Streaming drains",
        text,
    )
    with open(README, "w") as f:
        f.write(text)
    print(f"README refreshed: {n} queries, {n_stream} streaming drains")

    notes = latest_round_notes()
    if notes is None:
        return
    snapshot_artifacts()
    ntext = open(notes).read()
    if STAMP_BEGIN not in ntext or STAMP_END not in ntext:
        print(f"{os.path.basename(notes)}: no stamp markers, skipped")
        return
    pattern = re.compile(
        re.escape(STAMP_BEGIN) + r".*?" + re.escape(STAMP_END), re.DOTALL
    )
    ntext = pattern.sub(
        STAMP_BEGIN + "\n" + stamped_block() + "\n" + STAMP_END, ntext
    )
    with open(notes, "w") as f:
        f.write(ntext)
    print(f"{os.path.basename(notes)}: stamped block refreshed")


if __name__ == "__main__":
    main()
