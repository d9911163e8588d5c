"""Variance profile of `emb_covariance` (VERDICT r10 #4: the row has
drifted above its frozen baseline in two consecutive rounds and
cleared on re-run each time — find out whether the baseline median is
wrong or the row is just high-variance).

Runs the query N times in ONE session at the bench tier (sf0.1,
$SPARK_GRAFT_SF_DIR override honored) with the same count+hash
materialization bench.py uses, and reports first-run / min / median /
max plus the per-run list. A first-run ≫ steady-state gap means the
bench-order position (codegen/JIT state) drives the flags; a wide
steady-state spread means GC sensitivity; a tight spread at the
baseline value means the frozen median is right and re-run clearing is
the mechanism working as designed.

Usage: python tools/probe_emb_covariance_variance.py [n_runs]
Writes EMB_COV_VARIANCE.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_emb_cov_variance")
    fn = q.queries()["emb_covariance"]
    times: list[float] = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.select(
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns]))
        ).collect()
        times.append(round(time.perf_counter() - t0, 3))
        print(f"run {i}: {times[-1]:.3f}s", file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "runs": times,
        "first_s": times[0],
        "min_s": min(times),
        "median_s": round(statistics.median(times), 3),
        "max_s": max(times),
        "steady_median_s": round(statistics.median(times[1:]), 3),
        "baseline_s": json.load(
            open(os.path.join(REPO, "BENCH_BASELINE.json"))
        )["queries"].get("emb_covariance"),
    }
    path = os.path.join(REPO, "EMB_COV_VARIANCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), file=sys.stderr)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
