"""10× scale probe: build a sf1-equivalent dataset from sf0.1 and
measure how the headline plans scale.

The driver's testdata stops at sf0.1. To check the claim that the
plans survive a scale-up — not just pass at toy size — this script
materializes a 10× corpus (10 shifted copies of every scaled table,
key columns offset per copy so referential integrity and key
uniqueness hold) under .scratch/sf1 inside the repo, then times a
probe set of queries at both scales and prints the wall-time ratio
per query.

Expectations the numbers are judged against:
- scan/agg/join/window/signature plans: ≈10× data → ≤10× time
  (often less: fixed per-query overhead amortizes).
- pairwise dedup ops (LSH verify, exhaustive Jaccard) on a corpus
  that is literally 10 copies of itself are OUTPUT-bound: every copy
  pairs with every other, so the true result itself grows ~100×.
  Their ratios are reported with output row counts so quadratic
  OUTPUT isn't misread as quadratic ALGORITHM.

Writes parquet as multi-file directories — which also means the
sf1 scans are naturally parallel (the single-file sf0.1 inputs are
the reason operators carry conditional fan_out at all).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scratch", "sf1")
COPIES = 10

# Key families shift per copy by the family anchor's MAX key in the
# base corpus (not a fixed 10M stride): dense key spaces stay DENSE —
# rec_negative_samples' hash%n+1 draw requires contiguous partkeys
# (ADVICE r8: band-sparse shifted keys make most drawn negatives
# phantom and the positives anti-join vacuous, so the probe would time
# the wrong workload) — and FK members shift with their parent so
# joins stay consistent within each copy.
FAMILIES: dict[str, list[tuple[str, str]]] = {
    "customer.c_custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orders.o_orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "part.p_partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "supplier.s_suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "events.event_id": [("events", "event_id")],
    "events.user_id": [("events", "user_id")],
    "documents.doc_id": [("documents", "doc_id")],
    "embeddings.vec_id": [("embeddings", "vec_id")],
}
SHIFT_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem", "events",
    "documents", "embeddings",
]
COPY_AS_IS = ["region", "nation"]

PROBE = [
    "tpch_q1", "tpch_q3", "tpch_q9_profit", "tpch_q18_large_orders",
    "yf_agg_month", "win_topk_orders_per_customer",
    "evt_tumbling_5min", "evt_sessionize_30min", "evt_value_zscore",
    "evt_hypertable_rollup",
    "dedup_exact", "dedup_fingerprint", "dedup_simhash",
    "dedup_minhash_signature", "txt_token_stats", "txt_langid",
    "txt_chunk_windows", "txt_normalize", "curate_top_by_source",
    "txt_unigram_logprob", "txt_boilerplate_sentences",
    "ann_cosine_topk", "ann_ivf_topk", "ann_kmeans_assign",
    # output-bound pairwise ops (see module docstring)
    "dedup_minhash_lsh_pairs", "dedup_ngram_jaccard_exact_baseline",
    "dedup_ngram_jaccard_prefix",
    # round-8 additions: blocked fuzzy match (candidates stay linear
    # because build() rewrites c_name from the SHIFTED key — 10 copies
    # of one name would quadratically inflate every block, which real
    # unique registries don't do), survivorship fold, morton audit,
    # CM join-size sketch
    "er_match_pairs", "er_survivorship",
    "layout_zorder_vs_linear", "sketch_join_size_estimate",
    "dq_expectations_orders",       # one-pass gate + FK anti-join
    "dq_benford_totalprice",        # map-only digit projection
    "rec_negative_samples",         # per-user hash draws, one anti-join
]


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    offsets: dict[tuple[str, str], int] = {}
    for anchor, members in FAMILIES.items():
        at, ac = anchor.split(".")
        m = (
            spark.read.parquet(f"{SRC}/{at}.parquet")
            .agg(F.max(ac))
            .collect()[0][0]
        )
        for member in members:
            offsets[member] = int(m)
    for t in SHIFT_TABLES:
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        shifted_cols = [
            (col, off) for (tt, col), off in offsets.items() if tt == t
        ]
        parts = []
        for c in range(COPIES):
            df = base
            for k, off in shifted_cols:
                df = df.withColumn(k, F.col(k) + F.lit(c * off))
            if t == "customer":
                # keep the name's digit stream in sync with the shifted
                # key: a real registry has one name per entity, and the
                # ER family's blocking correctness depends on that —
                # 10 copies of an identical name would turn every block
                # quadratic, a corpus artifact not an operator property
                df = df.withColumn(
                    "c_name",
                    F.concat(
                        F.lit("Customer#"),
                        F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def _materialize(mk) -> tuple[int, float]:
    """(row count, steady-state seconds): full-column hash
    materialization timed twice, min taken (first run pays codegen
    compile + JIT); the row count rides the timed aggregate instead of
    a third full recomputation of the plan. mk is a THUNK re-invoked
    inside the timed region — operators that localCheckpoint eagerly
    do their work at query-construction time (same fix as
    scale_probe100)."""
    n = 0

    def run() -> float:
        nonlocal n
        t0 = time.perf_counter()
        df = mk()
        [(n, _)] = df.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
        ).collect()
        return time.perf_counter() - t0

    t = min(run(), run())
    return n, t


def main() -> None:
    only = None
    if "--only" in sys.argv:  # probe a subset, merge into existing JSON
        only = sys.argv[sys.argv.index("--only") + 1]
    spark = get_spark(app_name="scale_probe")
    if not os.path.exists(f"{DST}/events.parquet") or "--rebuild" in sys.argv:
        print("building sf1 ...", file=sys.stderr)
        build(spark)
    reg = q.queries()
    results = {}
    out = os.path.join(REPO, "SCALEPROBE.json")
    if only is not None and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    pats = only.split(",") if only is not None else None
    for name in [
        n for n in PROBE if pats is None or any(p in n for p in pats)
    ]:
        fn = reg[name]
        # per-query isolation: one failing plan records an error row
        # instead of losing the whole probe run
        try:
            n_small, t_small = _materialize(lambda: fn(spark, SRC))
            n_big, t_big = _materialize(lambda: fn(spark, DST))
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:200]
            results[name] = {"error": msg}
            print(f"{name}: ERROR {msg}", file=sys.stderr)
            continue
        results[name] = {
            "t_01": round(t_small, 3),
            "t_1": round(t_big, 3),
            "ratio": round(t_big / t_small, 2) if t_small > 0 else None,
            "rows_01": n_small,
            "rows_1": n_big,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(x{results[name]['ratio']}) rows {n_small} -> {n_big}",
            file=sys.stderr,
        )
    # write the file directly — the JVM emits gc,alloc warnings on
    # STDOUT under memory pressure, which corrupts redirected output
    with open(out, "w") as f:
        json.dump(results, f)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
