"""Core-count scaling at the 100x tier (round 12, VERDICT r11 #7).

At sf0.1 every slowest-set query runs FASTER on 8 cores than 32 (the
whole hot set is scheduler-barrier-bound at that size), so the sf0.1
bench structurally cannot demonstrate data-parallel scaling. This
probe times the top production families on the 100x corpus
(tools/scale_probe100.py's perturbed-copy build) at the core count
given by $SPARK_GRAFT_CPUS and appends a row into
SCALE100_CORES.json, so two runs (32 and 8) yield per-query core
ratios at a tier where compute, not barriers, dominates.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/probe_core_scaling100.py
  SPARK_GRAFT_CPUS=8  python tools/probe_core_scaling100.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402

import scale_probe100 as sp100  # noqa: E402

OUT = os.path.join(REPO, "SCALE100_CORES.json")

PROBE = [
    "dedup_minhash_lsh_pairs",
    "dedup_repeated_spans",
    "dedup_repeated_spans_keep_first",
    "pipeline_span_clean",
    "dedup_incremental_near_dup",
    "dedup_incremental_near_dup_two_batches",
    "txt_gopher_ngrams",
    "txt_quality_gate",
    "graph_pagerank",
    "emb_covariance",
    "emb_top_eigen",
    "ann_ivf_topk",
    "curate_near_dup_keep_best",
    "decontaminate_spans",
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name=f"core_scaling100_c{cpus}")
    if not os.path.exists(f"{sp100.DST}/documents.parquet"):
        print("building 100x corpus ...", file=sys.stderr)
        sp100.build(spark)
    reg = q.queries()
    results: dict[str, dict] = {}
    for name in PROBE:
        fn = reg[name]

        def run() -> float:
            t0 = time.perf_counter()
            df = fn(spark, sp100.DST)
            df.select(
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
                F.count(F.lit(1)),
            ).collect()
            return time.perf_counter() - t0

        try:
            t = min(run(), run())  # min-of-2, same policy as bench.py
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": str(exc).split("\n")[0][:200]}
            print(f"{name}: ERROR {results[name]['error']}", file=sys.stderr)
            continue
        results[name] = {"t_s": round(t, 3)}
        print(f"{name}: {t:.2f}s @ {cpus} cores", file=sys.stderr)
        # drop driver refs to the previous query's checkpointed RDDs so
        # the ContextCleaner can free their persist blocks — without
        # this, accumulated blocks squeeze execution memory and the
        # highest-concurrency config pays GC thrash (same policy as
        # scale_probe100.py)
        gc.collect()
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[f"cores_{cpus}"] = results
    runs = {
        k: v for k, v in data.items() if k.startswith("cores_")
    }
    if len(runs) >= 2:
        (ka, va), (kb, vb) = sorted(
            runs.items(), key=lambda kv: -int(kv[0].split("_")[1])
        )[:2]
        hi, lo = int(ka.split("_")[1]), int(kb.split("_")[1])
        data["ratio"] = {
            "cores_high": hi,
            "cores_low": lo,
            # t_low / t_high: > 1 means more cores = faster; the ideal
            # data-parallel value is cores_high / cores_low
            "per_query": {
                n: round(vb[n]["t_s"] / va[n]["t_s"], 2)
                for n in va
                if "t_s" in va.get(n, {}) and "t_s" in vb.get(n, {})
            },
            "ideal": round(hi / lo, 2),
        }
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
